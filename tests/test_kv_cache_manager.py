"""Paged KV-cache manager tests (reference tests/test_kv_cache_manager.py:336
tier: pure-python block allocator behavior)."""

import numpy as np
import pytest

from trtllm_llama_tpu.runtime.kv_cache_manager import (
    BlocksManager, KVCacheManager,
)


def test_allocate_release_cycle():
    bm = BlocksManager(num_blocks=4, block_size=8)
    blocks = [bm.allocate() for _ in range(4)]
    assert bm.free_blocks == 0
    with pytest.raises(RuntimeError):
        bm.allocate()
    for b in blocks:
        bm.release(b)
    assert bm.free_blocks == 4


def test_refcount_sharing():
    bm = BlocksManager(2, 8)
    b = bm.allocate()
    bm.retain(b)
    bm.release(b)
    assert bm.free_blocks == 1          # still held once
    bm.release(b)
    assert bm.free_blocks == 2
    with pytest.raises(RuntimeError):
        bm.release(b)


def test_sequence_block_growth():
    mgr = KVCacheManager(num_blocks=8, block_size=4, max_blocks_per_seq=4)
    mgr.add_sequence(0, context_len=6)      # needs 2 blocks
    assert mgr.blocks.free_blocks == 6
    mgr.append_token(0)                      # 7 -> still 2 blocks
    mgr.append_token(0)                      # 8 -> still 2 (exactly full)
    assert mgr.blocks.free_blocks == 6
    mgr.append_token(0)                      # 9 -> 3rd block
    assert mgr.blocks.free_blocks == 5
    table = mgr.block_table([0])
    assert (table[0, :3] >= 0).all() and table[0, 3] == -1
    mgr.remove_sequence(0)
    assert mgr.blocks.free_blocks == 8


def test_fork_shares_then_cow():
    mgr = KVCacheManager(num_blocks=8, block_size=4, max_blocks_per_seq=4)
    mgr.add_sequence(0, context_len=4)       # 1 full block
    mgr.fork_sequence(0, 1)
    assert mgr.blocks.free_blocks == 7       # shared, no new block
    t0, t1 = mgr.block_table([0]), mgr.block_table([1])
    assert t0[0, 0] == t1[0, 0]
    # both advance: each needs its own new tail block
    mgr.append_token(0)
    mgr.append_token(1)
    t0, t1 = mgr.block_table([0]), mgr.block_table([1])
    assert t0[0, 0] == t1[0, 0]              # context still shared
    assert t0[0, 1] != t1[0, 1]              # tails diverged
    assert mgr.blocks.free_blocks == 5
    mgr.remove_sequence(0)
    assert mgr.blocks.free_blocks == 6       # shared block still held by 1
    mgr.remove_sequence(1)
    assert mgr.blocks.free_blocks == 8


def test_cow_on_partial_shared_tail():
    mgr = KVCacheManager(num_blocks=8, block_size=4, max_blocks_per_seq=4)
    mgr.add_sequence(0, context_len=2)       # half-full block, shared on fork
    mgr.fork_sequence(0, 1)
    mgr.append_token(1)                      # must COW the shared tail
    t0, t1 = mgr.block_table([0]), mgr.block_table([1])
    assert t0[0, 0] != t1[0, 0]
    assert mgr.seq_length(1) == 3 and mgr.seq_length(0) == 2


def test_oom_raises():
    mgr = KVCacheManager(num_blocks=2, block_size=4, max_blocks_per_seq=8)
    mgr.add_sequence(0, 8)                   # consumes both blocks
    with pytest.raises(RuntimeError):
        mgr.add_sequence(1, 4)


def test_max_blocks_per_seq_enforced():
    mgr = KVCacheManager(num_blocks=8, block_size=2, max_blocks_per_seq=2)
    mgr.add_sequence(0, 4)
    with pytest.raises(RuntimeError):
        mgr.append_token(0)


def test_cow_emits_copy_directive():
    """Copy-on-write of a shared partially-filled tail must surface a
    (src, dst) device-copy directive — otherwise the forked sequence's
    tail tokens point at an uninitialized block."""
    from trtllm_llama_tpu.runtime.kv_cache_manager import KVCacheManager
    m = KVCacheManager(num_blocks=8, block_size=4, max_blocks_per_seq=4)
    m.add_sequence(0, 6)                  # tail block holds 2 of 4 slots
    m.fork_sequence(0, 1)
    src_tail = m.block_table([1])[0][1]
    m.append_token(1)                     # COW: fresh tail for seq 1
    dst_tail = m.block_table([1])[0][1]
    assert dst_tail != src_tail
    assert m.pop_pending_copies() == [(int(src_tail), int(dst_tail))]
    assert m.pop_pending_copies() == []   # drained


def test_add_sequence_rejects_over_long_context():
    from trtllm_llama_tpu.runtime.kv_cache_manager import KVCacheManager
    import pytest as _pytest
    m = KVCacheManager(num_blocks=16, block_size=4, max_blocks_per_seq=2)
    with _pytest.raises(RuntimeError, match="max_blocks_per_seq"):
        m.add_sequence(0, 12)
    assert m.blocks.free_blocks == 16     # nothing leaked


def test_fork_rejects_duplicate_dst():
    from trtllm_llama_tpu.runtime.kv_cache_manager import KVCacheManager
    import pytest as _pytest
    m = KVCacheManager(num_blocks=16, block_size=4, max_blocks_per_seq=4)
    m.add_sequence(0, 4)
    m.add_sequence(1, 4)
    with _pytest.raises(ValueError):
        m.fork_sequence(0, 1)
    assert m.blocks.free_blocks == 14     # no leak from the rejected fork
