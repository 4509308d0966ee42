// Native paged KV-cache block allocator with prefix caching.
//
// C++ twin of vllm_triton_backend_tpu/runtime/block_allocator.py (the
// reference implementation): O(1) page pool, ref-counted pages, hash-chain
// prefix cache with LRU eviction of unreferenced cached pages.  The engine
// calls this on the host critical path between device steps, so it is
// native (SURVEY.md §7 phase 1: "C++ KV-block allocator/page-pool").
//
// Exposed as a C ABI consumed via ctypes (runtime/native_pool.py).
// Semantics are kept byte-identical to the Python allocator; the pytest
// equivalence suite drives both against random workloads.

#include <cstdint>
#include <cstring>
#include <list>
#include <unordered_map>
#include <vector>

namespace {

// FNV-1a over (prev_hash, token block) — the chain hash.  Stable across
// processes (unlike Python's salted hash()).
static uint64_t chain_hash(uint64_t prev, const int32_t* tokens, int n) {
  uint64_t h = 1469598103934665603ull ^ prev;
  for (int i = 0; i < n; ++i) {
    uint32_t t = static_cast<uint32_t>(tokens[i]);
    for (int b = 0; b < 4; ++b) {
      h ^= (t >> (8 * b)) & 0xff;
      h *= 1099511628211ull;
    }
  }
  return h;
}

struct SeqBlocks {
  std::vector<int64_t> pages;
  std::vector<uint64_t> hashes;  // chain hash per owned full block
  int64_t num_cached_tokens = 0;
};

struct Pool {
  int64_t num_blocks;
  int64_t block_size;
  bool enable_prefix;

  std::vector<int64_t> free_list;               // LIFO
  std::unordered_map<int64_t, int64_t> refcount;
  std::unordered_map<uint64_t, int64_t> cache;   // hash -> page
  std::unordered_map<int64_t, uint64_t> page_hash;
  // LRU of refcount-0 pages still holding cached content
  std::list<int64_t> evictable;  // front = oldest
  std::unordered_map<int64_t, std::list<int64_t>::iterator> evict_pos;
  std::unordered_map<int64_t, SeqBlocks> seqs;

  explicit Pool(int64_t n, int64_t bs, bool prefix)
      : num_blocks(n), block_size(bs), enable_prefix(prefix) {
    free_list.reserve(n);
    for (int64_t i = n - 1; i >= 0; --i) free_list.push_back(i);
  }

  int64_t num_free() const {
    return static_cast<int64_t>(free_list.size() + evictable.size());
  }

  void drop_evictable(int64_t page) {
    auto it = evict_pos.find(page);
    if (it != evict_pos.end()) {
      evictable.erase(it->second);
      evict_pos.erase(it);
    }
  }

  int64_t pop_page() {
    if (!free_list.empty()) {
      int64_t p = free_list.back();
      free_list.pop_back();
      return p;
    }
    if (!evictable.empty()) {
      int64_t p = evictable.front();
      evictable.pop_front();
      evict_pos.erase(p);
      auto hit = page_hash.find(p);
      if (hit != page_hash.end()) {
        auto cit = cache.find(hit->second);
        if (cit != cache.end() && cit->second == p) cache.erase(cit);
        page_hash.erase(hit);
      }
      return p;
    }
    return -1;  // exhausted
  }

  void incref(int64_t page) {
    ++refcount[page];
    drop_evictable(page);
  }

  void decref(int64_t page) {
    auto it = refcount.find(page);
    if (it == refcount.end()) return;
    if (--it->second == 0) {
      refcount.erase(it);
      if (page_hash.count(page)) {
        evictable.push_back(page);
        evict_pos[page] = std::prev(evictable.end());
      } else {
        free_list.push_back(page);
      }
    }
  }
};

}  // namespace

extern "C" {

void* pp_create(int64_t num_blocks, int64_t block_size, int enable_prefix) {
  return new Pool(num_blocks, block_size, enable_prefix != 0);
}

void pp_destroy(void* h) { delete static_cast<Pool*>(h); }

int64_t pp_num_free_blocks(void* h) {
  return static_cast<Pool*>(h)->num_free();
}

int pp_can_allocate(void* h, int64_t prompt_len) {
  Pool* p = static_cast<Pool*>(h);
  int64_t needed = (prompt_len + p->block_size - 1) / p->block_size;
  return p->num_free() >= needed ? 1 : 0;
}

// Allocate a sequence; returns num_cached_tokens, or -1 on pool
// exhaustion (state unchanged on failure is NOT guaranteed — caller
// checks pp_can_allocate first, as the Python engine does).
int64_t pp_allocate(void* h, int64_t seq_id, const int32_t* prompt,
                    int64_t prompt_len) {
  Pool* p = static_cast<Pool*>(h);
  if (p->seqs.count(seq_id)) return -2;
  SeqBlocks sb;
  const int64_t bs = p->block_size;
  const int64_t n_full = prompt_len / bs;
  uint64_t prev = 0;
  int64_t matched = 0;
  if (p->enable_prefix) {
    for (int64_t i = 0; i < n_full; ++i) {
      uint64_t hh = chain_hash(prev, prompt + i * bs, (int)bs);
      auto it = p->cache.find(hh);
      if (it == p->cache.end()) break;
      sb.pages.push_back(it->second);
      sb.hashes.push_back(hh);
      p->incref(it->second);
      prev = hh;
      ++matched;
    }
  }
  // keep >= 1 token uncached so last-token logits are computed
  if (matched > 0 && matched * bs == prompt_len) {
    int64_t page = sb.pages.back();
    sb.pages.pop_back();
    sb.hashes.pop_back();
    p->decref(page);
    --matched;
  }
  sb.num_cached_tokens = matched * bs;
  int64_t total_blocks = (prompt_len + bs - 1) / bs;
  for (int64_t i = matched; i < total_blocks; ++i) {
    int64_t page = p->pop_page();
    if (page < 0) return -1;
    sb.pages.push_back(page);
    p->incref(page);
  }
  p->seqs.emplace(seq_id, std::move(sb));
  return p->seqs[seq_id].num_cached_tokens;
}

// Grow the sequence to cover seq_len tokens; returns 0 ok, -1 exhausted.
int pp_append_slots(void* h, int64_t seq_id, int64_t seq_len) {
  Pool* p = static_cast<Pool*>(h);
  auto it = p->seqs.find(seq_id);
  if (it == p->seqs.end()) return -2;
  SeqBlocks& sb = it->second;
  while ((int64_t)sb.pages.size() * p->block_size < seq_len) {
    int64_t page = p->pop_page();
    if (page < 0) return -1;
    sb.pages.push_back(page);
    p->incref(page);
  }
  return 0;
}

// Publish hashes for now-complete blocks (prefix cache).
void pp_publish(void* h, int64_t seq_id, const int32_t* tokens,
                int64_t n_tokens) {
  Pool* p = static_cast<Pool*>(h);
  if (!p->enable_prefix) return;
  auto it = p->seqs.find(seq_id);
  if (it == p->seqs.end()) return;
  SeqBlocks& sb = it->second;
  const int64_t bs = p->block_size;
  const int64_t n_full = n_tokens / bs;
  uint64_t prev = sb.hashes.empty() ? 0 : sb.hashes.back();
  for (int64_t i = (int64_t)sb.hashes.size(); i < n_full; ++i) {
    uint64_t hh = chain_hash(prev, tokens + i * bs, (int)bs);
    int64_t page = sb.pages[i];
    sb.hashes.push_back(hh);
    if (!p->cache.count(hh)) {
      p->cache[hh] = page;
      p->page_hash[page] = hh;
    }
    prev = hh;
  }
}

void pp_free_seq(void* h, int64_t seq_id) {
  Pool* p = static_cast<Pool*>(h);
  auto it = p->seqs.find(seq_id);
  if (it == p->seqs.end()) return;
  for (int64_t page : it->second.pages) p->decref(page);
  p->seqs.erase(it);
}

int64_t pp_block_table(void* h, int64_t seq_id, int64_t* out, int64_t cap) {
  Pool* p = static_cast<Pool*>(h);
  auto it = p->seqs.find(seq_id);
  if (it == p->seqs.end()) return -1;
  int64_t n = (int64_t)it->second.pages.size();
  for (int64_t i = 0; i < n && i < cap; ++i) out[i] = it->second.pages[i];
  return n;
}

int64_t pp_num_cached_tokens(void* h, int64_t seq_id) {
  Pool* p = static_cast<Pool*>(h);
  auto it = p->seqs.find(seq_id);
  return it == p->seqs.end() ? -1 : it->second.num_cached_tokens;
}

}  // extern "C"
