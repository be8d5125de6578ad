"""Known-asset registry and downloader.

Mirrors the reference's OneDrive asset registry
(/root/reference/fourier_feature_nets/utils.py:100-176). Downloads are
attempted with ``requests`` when the environment has network egress
and fail gracefully (returning False) when it does not; for air-gapped
runs, :mod:`fourier_feature_nets_tpu.datasets.synthetic` generates
fully self-contained scenes in the same NPZ schema.
"""

import base64
import os

__all__ = ["ASSETS", "download_asset", "default_data_dir"]

_ONEDRIVE = {
    "antinous_400.npz": "https://1drv.ms/u/s!AnWvK2b51nGqluBagOAnmTej7LJb_Q",
    "antinous_800.npz": "https://1drv.ms/u/s!AnWvK2b51nGqluIjnhVcVei5mZMIpw",
    "benin_400.npz": "https://1drv.ms/u/s!AnWvK2b51nGqluIX9MtESyi1LX9L8Q",
    "benin_800.npz": "https://1drv.ms/u/s!AnWvK2b51nGqluIlZRDTjHdSQnt_2A",
    "lego_400.npz": "https://1drv.ms/u/s!AnWvK2b51nGqluBbbdxzOG5q4a98yA",
    "lego_800.npz": "https://1drv.ms/u/s!AnWvK2b51nGqluIb8oRozVWUMQCfmg",
    "matthew_400.npz": "https://1drv.ms/u/s!AnWvK2b51nGqluIz9A0gFTi-yBs8zQ",
    "matthew_800.npz": "https://1drv.ms/u/s!AnWvK2b51nGqluI0rBTyq9jSnd4IjA",
    "rubik_400.npz": "https://1drv.ms/u/s!AnWvK2b51nGqluI60mrfqAcxYIsdLg",
    "rubik_800.npz": "https://1drv.ms/u/s!AnWvK2b51nGqluI7DdBRXbBngRMEew",
    "trex_400.npz": "https://1drv.ms/u/s!AnWvK2b51nGqluM59kAfIq0H1AVdQA",
    "trex_800.npz": "https://1drv.ms/u/s!AnWvK2b51nGqluM63nCZzfryxRR7ow",
}

_PRETRAINED = {
    # reference-trained model checkpoints (utils.py:113-133); these are
    # torch .pt files — load_model imports them via load_torch_model.
    "antinous_800_vox128.pt": "https://1drv.ms/u/s!AnWvK2b51nGqluJLoo7yjPYQz8W5dg",
    "antinous_800_nerf.pt": "https://1drv.ms/u/s!AnWvK2b51nGqluJclttRvj65vHpUiA",
    "benin_800_vox128.pt": "https://1drv.ms/u/s!AnWvK2b51nGqluJNUlKmPZJiZ3HUlg",
    "benin_800_nerf.pt": "https://1drv.ms/u/s!AnWvK2b51nGqluJd2newCq4oVIlrXw",
    "lego_800_vox128.pt": "https://1drv.ms/u/s!AnWvK2b51nGqluJM8A6nLNsSxgaZLw",
    "lego_800_nerf.pt": "https://1drv.ms/u/s!AnWvK2b51nGqluJeY79jz1o51K4CIg",
    "matthew_800_vox128.pt": "https://1drv.ms/u/s!AnWvK2b51nGqluJOcOc6Ce3ZUcQl3g",
    "matthew_800_nerf.pt": "https://1drv.ms/u/s!AnWvK2b51nGqluJf0KKODbTR291vwQ",
    "trex_800_vox128.pt": "https://1drv.ms/u/s!AnWvK2b51nGqluM74RKvya3PjvzqTw",
    "trex_800_nerf.pt": "https://1drv.ms/u/s!AnWvK2b51nGqluNNxRr0lxo_U8-Kmg",
    "antinous_400_mlp.pt": "https://1drv.ms/u/s!AnWvK2b51nGqluJqpdzBhx9QAtbJ-g",
    "antinous_400_pos.pt": "https://1drv.ms/u/s!AnWvK2b51nGqluJokd4Fl4UGLI_bNw",
    "benin_400_mlp.pt": "https://1drv.ms/u/s!AnWvK2b51nGqluJlhzc0JjMUus5HsA",
    "benin_400_pos.pt": "https://1drv.ms/u/s!AnWvK2b51nGqluJkAd3De0s2DR_RoA",
    "lego_400_mlp.pt": "https://1drv.ms/u/s!AnWvK2b51nGqluJnRCQdmHfJiXvGNw",
    "lego_400_pos.pt": "https://1drv.ms/u/s!AnWvK2b51nGqluJrPmpRYZlP0fP5Eg",
    "matthew_400_mlp.pt": "https://1drv.ms/u/s!AnWvK2b51nGqluJmKYDqQpitLHVIHg",
    "matthew_400_pos.pt": "https://1drv.ms/u/s!AnWvK2b51nGqluJpn1o7zC8uhdSDXA",
    "trex_400_mlp.pt": "https://1drv.ms/u/s!AnWvK2b51nGqluNLAlM2t9uTqFO5DA",
    "trex_400_pos.pt": "https://1drv.ms/u/s!AnWvK2b51nGqluNMcZoNeFnSwCnSNw",
}

_OCTREES = {
    # pre-built octree scenes (utils.py:134-135)
    "antinous_octree_8.npz": "https://1drv.ms/u/s!AnWvK2b51nGqluJt3FR8NAJW84HT2A",
    "antinous_octree_10.npz": "https://1drv.ms/u/s!AnWvK2b51nGqluJupuBKuwq0hYk-Tw",
}

#: All assets known to the framework: 12 datasets, 20 pretrained model
#: checkpoints, 2 octree scenes (reference utils.py:100-136 registry).
ASSETS = {**_ONEDRIVE, **_PRETRAINED, **_OCTREES}


def default_data_dir() -> str:
    """Directory where downloaded/generated datasets are cached."""
    root = os.environ.get("FFN_TPU_DATA_DIR")
    if root:
        return root
    return os.path.join(os.path.expanduser("~"), ".cache",
                        "fourier_feature_nets_tpu")


def _onedrive_direct_url(share_link: str) -> str:
    """Converts a OneDrive share link to a direct-download URL
    (utils.py:138-142 scheme)."""
    data = base64.b64encode(share_link.encode("utf-8")).decode("utf-8")
    data = data.replace("/", "_").replace("+", "-").rstrip("=")
    return f"https://api.onedrive.com/v1.0/shares/u!{data}/root/content"


def download_asset(name: str, output_path: str) -> bool:
    """Downloads a known asset. Returns False on any failure
    (unknown asset, no network, HTTP error) instead of raising."""
    if name not in ASSETS:
        print("Unrecognized asset:", name)
        return False
    try:
        import requests
        url = _onedrive_direct_url(ASSETS[name])
        res = requests.get(url, stream=True, timeout=30)
        res.raise_for_status()
        os.makedirs(os.path.dirname(os.path.abspath(output_path)),
                    exist_ok=True)
        # stream into a temp file and rename on success: a mid-download
        # failure must not leave a truncated file that later
        # os.path.exists cache checks treat as a valid asset
        partial_path = output_path + ".partial"
        try:
            with open(partial_path, "wb") as file:
                for chunk in res.iter_content(chunk_size=1 << 16):
                    if chunk:
                        file.write(chunk)
            os.replace(partial_path, output_path)
        finally:
            if os.path.exists(partial_path):
                os.unlink(partial_path)
        return True
    except Exception as error:  # air-gapped or transient failure
        print(f"Unable to download {name}: {error}")
        return False
