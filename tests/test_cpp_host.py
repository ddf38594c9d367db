"""Native (C++) host runtime vs Python spec: equivalence tests.

Analogue of the reference's cross-runtime goldens (Python runtime as oracle
for the C++ GptSession, cpp/tests/README.md:24-48): the Python Scheduler /
KVCacheManager are the spec; the C++ library must behave identically under
randomized operation sequences.
"""

import numpy as np
import pytest

from trtllm_llama_tpu.runtime import cpp_host
from trtllm_llama_tpu.runtime.kv_cache_manager import KVCacheManager
from trtllm_llama_tpu.runtime.scheduler import Scheduler

pytestmark = pytest.mark.skipif(not cpp_host.available(),
                                reason="native lib build failed")


def test_scheduler_basic_equivalence():
    py = Scheduler(max_slots=2, max_seq_len=32)
    cc = cpp_host.CppScheduler(max_slots=2, max_seq_len=32)

    ids = [[1, 2, 3], [4, 5], [6]]
    rids_py = [py.submit(x, 4) for x in ids]
    rids_cc = [cc.submit(x, 4) for x in ids]
    assert rids_py == rids_cc

    adm_py = [(r.request_id, r.slot) for r in py.admit()]
    adm_cc = cc.admit()
    assert adm_py == adm_cc
    assert py.num_queued == cc.num_queued == 1

    assert py.record_token(rids_py[0], 9, eos_id=9) \
        == cc.record_token(rids_cc[0], 9, eos_id=9) is True
    assert py.num_active == cc.num_active == 1

    adm_py = [(r.request_id, r.slot) for r in py.admit()]
    assert adm_py == cc.admit()


def test_scheduler_capacity_equivalence():
    py = Scheduler(4, 64, kv_token_capacity=40)
    cc = cpp_host.CppScheduler(4, 64, kv_token_capacity=40)
    for _ in range(3):
        py.submit([0] * 10, 10)
        cc.submit([0] * 10, 10)
    assert len(py.admit()) == len(cc.admit()) == 2
    assert py.num_queued == cc.num_queued == 1


def test_scheduler_randomized_equivalence():
    rng = np.random.default_rng(0)
    py = Scheduler(4, 64)
    cc = cpp_host.CppScheduler(4, 64)
    live = []

    for step in range(300):
        op = rng.integers(0, 4)
        if op == 0:  # submit
            n = int(rng.integers(1, 16))
            new = int(rng.integers(1, 8))
            assert py.submit([0] * n, new) == cc.submit([0] * n, new)
        elif op == 1:  # admit
            a = [(r.request_id, r.slot) for r in py.admit()]
            assert a == cc.admit()
            live.extend(rid for rid, _ in a)
        elif op == 2 and live:  # record token
            rid = live[int(rng.integers(0, len(live)))]
            tok = int(rng.integers(0, 5))
            fin_py = py.record_token(rid, tok, eos_id=3) \
                if rid in py._active else None
            if fin_py is None:
                continue
            fin_cc = cc.record_token(rid, tok, eos_id=3)
            assert fin_py == fin_cc
            if fin_py:
                live.remove(rid)
        elif op == 3 and live and rng.integers(0, 10) == 0:  # rare cancel
            rid = live.pop(int(rng.integers(0, len(live))))
            py.cancel(rid)
            cc.cancel(rid)
        assert py.num_active == cc.num_active
        assert py.num_queued == cc.num_queued
        assert py.slots.free_count == cc.free_slots
        assert py._reserved_tokens == cc.reserved_tokens


def test_kvmgr_equivalence_randomized():
    rng = np.random.default_rng(1)
    py = KVCacheManager(num_blocks=16, block_size=4, max_blocks_per_seq=6)
    cc = cpp_host.CppKVCacheManager(16, 4, 6)
    live = []
    next_id = 0

    for step in range(500):
        op = rng.integers(0, 10)
        try:
            if op <= 2:
                sid, next_id = next_id, next_id + 1
                ctx = int(rng.integers(1, 12))
                err_py = err_cc = None
                try:
                    py.add_sequence(sid, ctx)
                except RuntimeError:
                    err_py = "oom"
                try:
                    cc.add_sequence(sid, ctx)
                except RuntimeError:
                    err_cc = "oom"
                assert err_py == err_cc
                if err_py is None:
                    live.append(sid)
            elif op <= 5 and live:
                sid = live[int(rng.integers(0, len(live)))]
                err_py = err_cc = None
                try:
                    py.append_token(sid)
                except RuntimeError as e:
                    err_py = str(e)[:8]
                try:
                    cc.append_token(sid)
                except RuntimeError as e:
                    err_cc = str(e)[:8]
                assert err_py == err_cc
            elif op == 6 and live:
                src = live[int(rng.integers(0, len(live)))]
                dst, next_id = next_id, next_id + 1
                py.fork_sequence(src, dst)
                cc.fork_sequence(src, dst)
                live.append(dst)
            elif op >= 7 and live:
                sid = live.pop(int(rng.integers(0, len(live))))
                py.remove_sequence(sid)
                cc.remove_sequence(sid)
        finally:
            assert py.blocks.free_blocks == cc.free_blocks
            assert py.pop_pending_copies() == cc.pop_pending_copies(), step
            if live:
                np.testing.assert_array_equal(
                    py.block_table(live), cc.block_table(live))
                for sid in live:
                    assert py.seq_length(sid) == cc.seq_length(sid)
