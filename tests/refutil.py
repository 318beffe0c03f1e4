"""Import helpers for the reference AutoAWQ implementation at
/root/reference — used as a CPU-torch ORACLE by the parity tests.

The reference pins transformers<=4.51; the installed 4.57 removed
``PytorchGELUTanh``, so we shim the name to ``GELUActivation`` before
importing ``awq`` (the reference only isinstance-checks it when scaling
gelu outputs, awq/quantize/scale.py). Nothing from the reference is
copied into the package — tests import it at runtime to compare behavior.
"""

import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"


def import_reference():
    torch = pytest.importorskip("torch")
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import transformers.activations as A

    if not hasattr(A, "PytorchGELUTanh"):
        A.PytorchGELUTanh = A.GELUActivation
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        import awq  # noqa: F401
    return sys.modules["awq"]


def reference_calib(data, n_samples, max_seq_len):
    """Run the reference's get_calib_dataset on token-id lists -> [n, L]."""
    import_reference()
    from awq.utils.calib_data import get_calib_dataset as ref_get

    blocks = ref_get(data=data, n_samples=n_samples, max_seq_len=max_seq_len)
    import torch

    return torch.cat(blocks, dim=0).numpy()
