"""Native sharded checkpoints via orbax (SURVEY §5 checkpoint/resume).

Two artifact families exist side by side:
* AutoAWQ-compatible safetensors (io/serialize.py) — ecosystem interop.
* Orbax checkpoints (this module) — fast native save/restore of the whole
  param pytree (packed int4 + fp leaves alike), including sharded arrays on
  a mesh; used for multi-host serving restarts and calibration resume.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional


def save(path: str, params: Dict[str, Any]) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), params, force=True)


def load(path: str, template: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(os.path.abspath(path), template)
        return ckptr.restore(os.path.abspath(path))
