"""Runs a reference CLI script (/root/reference/*.py) for head-to-head
parity measurements.

Usage:
    PYTHONPATH=/root/reference:/root/repo/tools/ref_stubs \
        python tools/ref_runner.py /root/reference/train_nerf.py ARGS...

The stubs under tools/ref_stubs satisfy the reference's optional
imports (numba/progress/scenepic/trimesh) with behavior-preserving
stand-ins; this runner additionally bridges a PyTorch version skew:
the reference targets torch 1.12 (azureml/aml_env.yml:1-12) where
``torch.load`` defaulted to full unpickling, while this image ships
torch>=2.6 where ``weights_only=True`` rejects the NumPy scalars the
reference embeds in its checkpoint ``params`` dicts
(fourier_feature_models.py:80-89). The checkpoints loaded here are
local files this environment itself produced, so full unpickling is
restored for the run.
"""

import runpy
import sys

import torch

_orig_load = torch.load


def _load(*args, **kwargs):
    kwargs.setdefault("weights_only", False)
    return _orig_load(*args, **kwargs)


torch.load = _load

if __name__ == "__main__":
    script = sys.argv[1]
    sys.argv = sys.argv[1:]
    runpy.run_path(script, run_name="__main__")
