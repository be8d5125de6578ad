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

#: Names of datasets known to the framework.
ASSETS = dict(_ONEDRIVE)


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
        with open(output_path, "wb") as file:
            for chunk in res.iter_content(chunk_size=1 << 16):
                if chunk:
                    file.write(chunk)
        return True
    except Exception as error:  # air-gapped or transient failure
        print(f"Unable to download {name}: {error}")
        return False
