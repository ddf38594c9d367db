"""ctypes bindings for the native host runtime (cpp/tllm_host.cpp).

Drop-in replacements for the pure-Python Scheduler and KVCacheManager with
the same observable behavior (verified by tests/test_cpp_host.py driving
both through identical operation sequences). The library is built on demand
with `make -C cpp` the first time it is needed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_REPO, "cpp", "libtllm_host.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", os.path.join(_REPO, "cpp")],
                       check=True, capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    i32, i64, vp = ctypes.c_int32, ctypes.c_int64, ctypes.c_void_p
    p_i32 = ctypes.POINTER(ctypes.c_int32)
    p_i64 = ctypes.POINTER(ctypes.c_int64)
    sigs = {
        "tllm_scheduler_create": ([i32, i32, i64], vp),
        "tllm_scheduler_destroy": ([vp], None),
        "tllm_submit": ([vp, p_i32, i32, i32], i64),
        "tllm_admit": ([vp, p_i64, p_i32, i32], i32),
        "tllm_record_token": ([vp, i64, i32, i32], i32),
        "tllm_cancel": ([vp, i64], None),
        "tllm_num_active": ([vp], i32),
        "tllm_num_queued": ([vp], i32),
        "tllm_has_work": ([vp], i32),
        "tllm_free_slots": ([vp], i32),
        "tllm_reserved_tokens": ([vp], i64),
        "tllm_active_slots": ([vp, p_i32, p_i64, i32], i32),
        "tllm_request_state": ([vp, i64], i32),
        "tllm_finish_reason": ([vp, i64], i32),
        "tllm_kvmgr_create": ([i32, i32, i32], vp),
        "tllm_kvmgr_destroy": ([vp], None),
        "tllm_kvmgr_free_blocks": ([vp], i32),
        "tllm_kvmgr_add_seq": ([vp, i64, i32], i32),
        "tllm_kvmgr_fork_seq": ([vp, i64, i64], i32),
        "tllm_kvmgr_append_token": ([vp, i64], i32),
        "tllm_kvmgr_remove_seq": ([vp, i64], None),
        "tllm_kvmgr_seq_length": ([vp, i64], i32),
        "tllm_kvmgr_block_table": ([vp, p_i64, i32, p_i32], None),
        "tllm_kvmgr_pop_pending": ([vp, p_i32, i32], i32),
    }
    for name, (argtypes, restype) in sigs.items():
        fn = getattr(lib, name)
        fn.argtypes = argtypes
        fn.restype = restype
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


class CppScheduler:
    """Native continuous-batching scheduler (see runtime/scheduler.py)."""

    FINISH_REASONS = {0: None, 1: "eos", 2: "length", 3: "cancelled"}

    def __init__(self, max_slots: int, max_seq_len: int,
                 kv_token_capacity: Optional[int] = None):
        self._lib = _load()
        self._h = self._lib.tllm_scheduler_create(
            max_slots, max_seq_len,
            -1 if kv_token_capacity is None else kv_token_capacity)
        self.max_slots = max_slots
        self.max_seq_len = max_seq_len

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.tllm_scheduler_destroy(self._h)
            self._h = None

    def submit(self, input_ids: List[int], max_new_tokens: int) -> int:
        arr = np.asarray(input_ids, np.int32)
        rid = self._lib.tllm_submit(
            self._h, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(arr), max_new_tokens)
        if rid < 0:
            raise ValueError("request exceeds max_seq_len")
        return int(rid)

    def admit(self):
        """Returns [(request_id, slot), ...] admitted this call."""
        rids = np.zeros(self.max_slots, np.int64)
        slots = np.zeros(self.max_slots, np.int32)
        n = self._lib.tllm_admit(
            self._h, rids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            slots.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.max_slots)
        return [(int(rids[i]), int(slots[i])) for i in range(n)]

    def record_token(self, request_id: int, token: int, eos_id: int) -> bool:
        return bool(self._lib.tllm_record_token(self._h, request_id, token,
                                                eos_id))

    def cancel(self, request_id: int):
        self._lib.tllm_cancel(self._h, request_id)

    def active_slots(self):
        slots = np.zeros(self.max_slots, np.int32)
        rids = np.zeros(self.max_slots, np.int64)
        n = self._lib.tllm_active_slots(
            self._h, slots.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            rids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            self.max_slots)
        return [(int(slots[i]), int(rids[i])) for i in range(n)]

    def finish_reason(self, request_id: int) -> Optional[str]:
        return self.FINISH_REASONS.get(
            self._lib.tllm_finish_reason(self._h, request_id))

    @property
    def num_active(self) -> int:
        return self._lib.tllm_num_active(self._h)

    @property
    def num_queued(self) -> int:
        return self._lib.tllm_num_queued(self._h)

    @property
    def has_work(self) -> bool:
        return bool(self._lib.tllm_has_work(self._h))

    @property
    def free_slots(self) -> int:
        return self._lib.tllm_free_slots(self._h)

    @property
    def reserved_tokens(self) -> int:
        return self._lib.tllm_reserved_tokens(self._h)


class CppKVCacheManager:
    """Native paged KV block allocator (see runtime/kv_cache_manager.py)."""

    def __init__(self, num_blocks: int, block_size: int,
                 max_blocks_per_seq: int):
        self._lib = _load()
        self._h = self._lib.tllm_kvmgr_create(num_blocks, block_size,
                                              max_blocks_per_seq)
        self.max_blocks_per_seq = max_blocks_per_seq

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.tllm_kvmgr_destroy(self._h)
            self._h = None

    @property
    def free_blocks(self) -> int:
        return self._lib.tllm_kvmgr_free_blocks(self._h)

    def add_sequence(self, seq_id: int, context_len: int):
        rc = self._lib.tllm_kvmgr_add_seq(self._h, seq_id, context_len)
        if rc == -1:
            raise RuntimeError("KV cache out of blocks")
        if rc == -2:
            raise ValueError(f"sequence {seq_id} already active")
        if rc == -3:
            raise RuntimeError("sequence exceeds max_blocks_per_seq")

    def pop_pending_copies(self):
        import ctypes
        buf = (ctypes.c_int32 * 256)()
        n = self._lib.tllm_kvmgr_pop_pending(self._h, buf, 128)
        return [(int(buf[2 * i]), int(buf[2 * i + 1])) for i in range(n)]

    def fork_sequence(self, src_id: int, dst_id: int):
        if self._lib.tllm_kvmgr_fork_seq(self._h, src_id, dst_id) != 0:
            raise ValueError("bad fork")

    def append_token(self, seq_id: int):
        rc = self._lib.tllm_kvmgr_append_token(self._h, seq_id)
        if rc == -1:
            raise RuntimeError("KV cache out of blocks")
        if rc == -3:
            raise RuntimeError("sequence exceeds max_blocks_per_seq")

    def remove_sequence(self, seq_id: int):
        self._lib.tllm_kvmgr_remove_seq(self._h, seq_id)

    def seq_length(self, seq_id: int) -> int:
        return self._lib.tllm_kvmgr_seq_length(self._h, seq_id)

    def block_table(self, seq_ids: List[int]) -> np.ndarray:
        arr = np.asarray(seq_ids, np.int64)
        out = np.zeros((len(arr), self.max_blocks_per_seq), np.int32)
        self._lib.tllm_kvmgr_block_table(
            self._h, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(arr), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out
