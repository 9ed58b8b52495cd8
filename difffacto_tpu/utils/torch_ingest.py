"""Reference PyTorch checkpoint ingestion (pretrained/<cat>.pth -> pytrees).

Maps the reference's torch state dict (reference: runner/runner.py:470-489
save layout; module names from models/encoders/*, models/diffusions/*) onto
this framework's Flax parameter tree. Implemented incrementally — see
``load_reference_checkpoint``.
"""

from __future__ import annotations

from typing import Any, Dict


def load_reference_checkpoint(path: str, model, state):
    """Load a reference ``.pth`` checkpoint into a TrainState.

    Not yet wired: the name-mapping table (torch channel-first convs /
    grouped per-part convs -> channel-last Dense / vmapped heads) lands with
    the parity milestone. Fails loudly rather than silently mis-mapping.
    """
    raise NotImplementedError(
        "reference .pth ingestion is not wired yet; convert the checkpoint "
        "with tools/convert_torch_ckpt.py (pending) or train from scratch"
    )
