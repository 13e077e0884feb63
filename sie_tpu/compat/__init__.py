"""Interoperability with the PyTorch reference implementation.

Bidirectional checkpoint conversion (reference ``checkpoint.pth``
state_dicts <-> sie_tpu flax variables); torch itself is imported lazily,
only by the ``*_torch_checkpoint`` helpers.
"""

from sie_tpu.compat.torch_export import (
    TorchExportError,
    export_state_dict,
    save_torch_checkpoint,
)
from sie_tpu.compat.torch_import import (
    TorchImportError,
    convert_state_dict,
    load_into_state,
    load_torch_checkpoint,
)

__all__ = [
    "TorchExportError",
    "TorchImportError",
    "convert_state_dict",
    "export_state_dict",
    "load_into_state",
    "load_torch_checkpoint",
    "save_torch_checkpoint",
]
