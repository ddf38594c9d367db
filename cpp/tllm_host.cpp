// Native host runtime: continuous-batching scheduler + paged KV block
// allocator.
//
// C++ implementation of the host-side serving machinery — the open
// equivalent of the reference's closed-source batch manager
// (cpp/tensorrt_llm/batch_manager: GptManager, batchSlotManager.h) plus the
// BlocksManager half of its Python KVCacheManager. Behavior is specified by
// the Python implementations in trtllm_llama_tpu/runtime/{scheduler.py,
// kv_cache_manager.py}; tests/test_cpp_host.py drives both through random
// operation sequences and asserts identical observable behavior.
//
// Exposed as a flat C ABI consumed via ctypes (no pybind11 in this image).
// Device work stays in JAX; this library owns only host bookkeeping, where
// per-step latency matters at large slot counts.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <deque>
#include <map>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Scheduler
// ---------------------------------------------------------------------------

enum ReqState { QUEUED = 0, PREFILL = 1, DECODE = 2, DONE = 3 };
enum FinishReason { NOT_FINISHED = 0, FIN_EOS = 1, FIN_LENGTH = 2,
                    FIN_CANCELLED = 3 };

struct Request {
  int64_t id;
  std::vector<int32_t> input_ids;
  int32_t max_new_tokens;
  ReqState state = QUEUED;
  int32_t slot = -1;
  int32_t generated = 0;
  FinishReason reason = NOT_FINISHED;
};

struct Scheduler {
  int32_t max_slots;
  int32_t max_seq_len;
  int64_t kv_capacity;
  int64_t reserved = 0;
  int64_t next_id = 0;
  std::vector<int32_t> free_slots;              // stack, top = back
  std::map<int32_t, int64_t> slot_owner;        // ordered for active_slots
  std::deque<Request*> queue;
  std::unordered_map<int64_t, Request*> active;
  std::unordered_map<int64_t, Request*> all;    // owns every request

  Scheduler(int32_t slots, int32_t seq_len, int64_t cap)
      : max_slots(slots), max_seq_len(seq_len), kv_capacity(cap) {
    // match Python SlotManager: list(range(max_slots-1,-1,-1)), pop() from
    // the back -> slot 0 allocated first
    for (int32_t i = slots - 1; i >= 0; --i) free_slots.push_back(i);
  }
  ~Scheduler() {
    for (auto& kv : all) delete kv.second;
  }
};

void* tllm_scheduler_create(int32_t max_slots, int32_t max_seq_len,
                            int64_t kv_capacity) {
  if (kv_capacity < 0)
    kv_capacity = static_cast<int64_t>(max_slots) * max_seq_len;
  return new Scheduler(max_slots, max_seq_len, kv_capacity);
}

void tllm_scheduler_destroy(void* h) { delete static_cast<Scheduler*>(h); }

// returns request id, or -1 if the request exceeds max_seq_len
int64_t tllm_submit(void* h, const int32_t* ids, int32_t n,
                    int32_t max_new_tokens) {
  auto* s = static_cast<Scheduler*>(h);
  if (n + max_new_tokens > s->max_seq_len) return -1;
  auto* r = new Request();
  r->id = s->next_id++;
  r->input_ids.assign(ids, ids + n);
  r->max_new_tokens = max_new_tokens;
  s->queue.push_back(r);
  s->all[r->id] = r;
  return r->id;
}

// FCFS admission; fills (rid, slot, prompt_len) triples; returns count
int32_t tllm_admit(void* h, int64_t* out_rids, int32_t* out_slots,
                   int32_t cap) {
  auto* s = static_cast<Scheduler*>(h);
  int32_t count = 0;
  while (!s->queue.empty() && !s->free_slots.empty() && count < cap) {
    Request* r = s->queue.front();
    int64_t need = static_cast<int64_t>(r->input_ids.size())
                   + r->max_new_tokens;
    if (s->reserved + need > s->kv_capacity) break;
    s->queue.pop_front();
    r->slot = s->free_slots.back();
    s->free_slots.pop_back();
    s->slot_owner[r->slot] = r->id;
    r->state = PREFILL;
    s->active[r->id] = r;
    s->reserved += need;
    out_rids[count] = r->id;
    out_slots[count] = r->slot;
    ++count;
  }
  return count;
}

static void finish(Scheduler* s, Request* r, FinishReason why) {
  r->reason = why;
  r->state = DONE;
  s->slot_owner.erase(r->slot);
  s->free_slots.push_back(r->slot);
  s->reserved -= static_cast<int64_t>(r->input_ids.size())
                 + r->max_new_tokens;
  s->active.erase(r->id);
}

// returns 1 if the request finished with this token, else 0
int32_t tllm_record_token(void* h, int64_t rid, int32_t token,
                          int32_t eos_id) {
  auto* s = static_cast<Scheduler*>(h);
  Request* r = s->active.at(rid);
  r->generated += 1;
  r->state = DECODE;
  if (token == eos_id) {
    finish(s, r, FIN_EOS);
    return 1;
  }
  if (r->generated >= r->max_new_tokens) {
    finish(s, r, FIN_LENGTH);
    return 1;
  }
  return 0;
}

void tllm_cancel(void* h, int64_t rid) {
  auto* s = static_cast<Scheduler*>(h);
  for (auto it = s->queue.begin(); it != s->queue.end(); ++it) {
    if ((*it)->id == rid) {
      (*it)->reason = FIN_CANCELLED;
      (*it)->state = DONE;
      s->queue.erase(it);
      return;
    }
  }
  auto it = s->active.find(rid);
  if (it != s->active.end()) finish(s, it->second, FIN_CANCELLED);
}

int32_t tllm_num_active(void* h) {
  return static_cast<int32_t>(static_cast<Scheduler*>(h)->active.size());
}
int32_t tllm_num_queued(void* h) {
  return static_cast<int32_t>(static_cast<Scheduler*>(h)->queue.size());
}
int32_t tllm_has_work(void* h) {
  auto* s = static_cast<Scheduler*>(h);
  return (!s->queue.empty() || !s->active.empty()) ? 1 : 0;
}
int32_t tllm_free_slots(void* h) {
  return static_cast<int32_t>(static_cast<Scheduler*>(h)->free_slots.size());
}
int64_t tllm_reserved_tokens(void* h) {
  return static_cast<Scheduler*>(h)->reserved;
}
// active slot list (sorted ascending); returns count
int32_t tllm_active_slots(void* h, int32_t* out_slots, int64_t* out_rids,
                          int32_t cap) {
  auto* s = static_cast<Scheduler*>(h);
  int32_t count = 0;
  for (auto& kv : s->slot_owner) {
    if (count >= cap) break;
    out_slots[count] = kv.first;
    out_rids[count] = kv.second;
    ++count;
  }
  return count;
}
int32_t tllm_request_state(void* h, int64_t rid) {
  auto* s = static_cast<Scheduler*>(h);
  auto it = s->all.find(rid);
  return it == s->all.end() ? -1 : it->second->state;
}
int32_t tllm_finish_reason(void* h, int64_t rid) {
  auto* s = static_cast<Scheduler*>(h);
  auto it = s->all.find(rid);
  return it == s->all.end() ? -1 : it->second->reason;
}

// ---------------------------------------------------------------------------
// Paged KV block allocator (spec: runtime/kv_cache_manager.py)
// ---------------------------------------------------------------------------

struct Block {
  int32_t idx;
  int32_t ref_count = 0;
};

struct KVMgr {
  int32_t block_size;
  int32_t max_blocks_per_seq;
  std::vector<Block> blocks;
  std::vector<int32_t> free_list;   // stack of block indices, top = back
  // (src, dst) copy directives from copy-on-write tail splits; the device
  // copies the partial tail before its next write (mirrors the Python spec)
  std::vector<std::pair<int32_t, int32_t>> pending_copies;
  struct Seq {
    std::vector<int32_t> blocks;
    int32_t length = 0;
  };
  std::unordered_map<int64_t, Seq> seqs;

  KVMgr(int32_t n, int32_t bs, int32_t maxb)
      : block_size(bs), max_blocks_per_seq(maxb) {
    blocks.resize(n);
    for (int32_t i = 0; i < n; ++i) blocks[i].idx = i;
    for (int32_t i = 0; i < n; ++i) free_list.push_back(i);
  }
  int32_t blocks_needed(int32_t len) const {
    int32_t n = (len + block_size - 1) / block_size;
    return n < 1 ? 1 : n;
  }
  int32_t alloc() {
    if (free_list.empty()) return -1;
    int32_t i = free_list.back();
    free_list.pop_back();
    blocks[i].ref_count = 1;
    return i;
  }
  void release(int32_t i) {
    if (--blocks[i].ref_count == 0) free_list.push_back(i);
  }
};

void* tllm_kvmgr_create(int32_t num_blocks, int32_t block_size,
                        int32_t max_blocks_per_seq) {
  return new KVMgr(num_blocks, block_size, max_blocks_per_seq);
}
void tllm_kvmgr_destroy(void* h) { delete static_cast<KVMgr*>(h); }

int32_t tllm_kvmgr_free_blocks(void* h) {
  return static_cast<int32_t>(static_cast<KVMgr*>(h)->free_list.size());
}

// returns 0 ok, -1 out of blocks, -2 duplicate id
int32_t tllm_kvmgr_add_seq(void* h, int64_t seq_id, int32_t context_len) {
  auto* m = static_cast<KVMgr*>(h);
  if (m->seqs.count(seq_id)) return -2;
  KVMgr::Seq st;
  int32_t need = m->blocks_needed(context_len);
  if (need > m->max_blocks_per_seq) return -3;
  for (int32_t i = 0; i < need; ++i) {
    int32_t b = m->alloc();
    if (b < 0) {                       // roll back partial allocation
      for (int32_t x : st.blocks) m->release(x);
      return -1;
    }
    st.blocks.push_back(b);
  }
  st.length = context_len;
  m->seqs[seq_id] = std::move(st);
  return 0;
}

int32_t tllm_kvmgr_fork_seq(void* h, int64_t src, int64_t dst) {
  auto* m = static_cast<KVMgr*>(h);
  auto it = m->seqs.find(src);
  if (it == m->seqs.end() || m->seqs.count(dst)) return -2;
  KVMgr::Seq st;
  for (int32_t b : it->second.blocks) {
    m->blocks[b].ref_count += 1;
    st.blocks.push_back(b);
  }
  st.length = it->second.length;
  m->seqs[dst] = std::move(st);
  return 0;
}

// returns 0 ok, -1 out of blocks, -3 exceeds max_blocks_per_seq
int32_t tllm_kvmgr_append_token(void* h, int64_t seq_id) {
  auto* m = static_cast<KVMgr*>(h);
  auto& st = m->seqs.at(seq_id);
  int32_t new_len = st.length + 1;
  int32_t needed = m->blocks_needed(new_len);
  if (needed > m->max_blocks_per_seq) return -3;
  if (needed > static_cast<int32_t>(st.blocks.size())) {
    int32_t b = m->alloc();
    if (b < 0) return -1;
    st.blocks.push_back(b);
  } else {
    int32_t tail = st.blocks.back();
    if (m->blocks[tail].ref_count > 1) {     // copy-on-write shared tail
      int32_t b = m->alloc();
      if (b < 0) return -1;
      m->release(tail);
      st.blocks.back() = b;
      m->pending_copies.emplace_back(tail, b);
    }
  }
  st.length = new_len;
  return 0;
}

// drains up to cap (src, dst) pairs into out (flattened); returns count
int32_t tllm_kvmgr_pop_pending(void* h, int32_t* out, int32_t cap) {
  auto* m = static_cast<KVMgr*>(h);
  int32_t n = 0;
  for (auto& pr : m->pending_copies) {
    if (n >= cap) break;
    out[2 * n] = pr.first;
    out[2 * n + 1] = pr.second;
    ++n;
  }
  m->pending_copies.erase(m->pending_copies.begin(),
                          m->pending_copies.begin() + n);
  return n;
}

void tllm_kvmgr_remove_seq(void* h, int64_t seq_id) {
  auto* m = static_cast<KVMgr*>(h);
  auto it = m->seqs.find(seq_id);
  if (it == m->seqs.end()) return;
  for (int32_t b : it->second.blocks) m->release(b);
  m->seqs.erase(it);
}

int32_t tllm_kvmgr_seq_length(void* h, int64_t seq_id) {
  auto* m = static_cast<KVMgr*>(h);
  auto it = m->seqs.find(seq_id);
  return it == m->seqs.end() ? -1 : it->second.length;
}

// fills row-major [n_seqs, max_blocks_per_seq] with block indices (-1 pad)
void tllm_kvmgr_block_table(void* h, const int64_t* seq_ids, int32_t n,
                            int32_t* out) {
  auto* m = static_cast<KVMgr*>(h);
  for (int32_t r = 0; r < n; ++r) {
    auto& st = m->seqs.at(seq_ids[r]);
    for (int32_t j = 0; j < m->max_blocks_per_seq; ++j) {
      out[r * m->max_blocks_per_seq + j] =
          j < static_cast<int32_t>(st.blocks.size()) ? st.blocks[j] : -1;
    }
  }
}

}  // extern "C"
