"""Debug observability: named intermediate-tensor capture.

The reference debugs by registering intermediates as extra engine outputs
(module.py register_network_output + --enable_debug_output,
docs/2023-05-19-how-to-debug.md). The JAX-native equivalent: model code
calls `debug_output(name, value)` at points of interest; normally a no-op,
but inside `capture()` every tagged value is copied to host (via
jax.debug.callback, which works inside jit/scan/while) and recorded on a
tape keyed by name — values tagged repeatedly (e.g. per scan layer) append.

    with debugging.capture() as tape:
        logits, _ = llama.forward_prefill(...)
    tape["attn_out"]   # list of [B, S, H*D] arrays, one per layer
"""

from __future__ import annotations

import contextlib
from collections import defaultdict

import jax

_STATE = {"enabled": False, "tape": None}


def debug_output(name: str, value):
    """Tag a traced intermediate. No-op unless inside capture()."""
    if not _STATE["enabled"]:
        return value

    def record(v, name=name):
        _STATE["tape"][name].append(v)

    jax.debug.callback(record, value)
    return value


@contextlib.contextmanager
def capture():
    """Collect all debug_output-tagged tensors produced in this scope.

    NOTE: functions jitted *before* entering capture() baked in the no-op;
    capture affects traces created inside the scope (use fresh jits or the
    eager path when debugging — same caveat as rebuilding a TRT engine with
    --enable_debug_output).
    """
    prev = (_STATE["enabled"], _STATE["tape"])
    _STATE["enabled"] = True
    _STATE["tape"] = defaultdict(list)
    try:
        yield _STATE["tape"]
    finally:
        _STATE["enabled"], _STATE["tape"] = prev
