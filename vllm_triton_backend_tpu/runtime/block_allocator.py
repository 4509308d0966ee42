"""Paged KV-cache block allocator with prefix caching.

The reference delegates block management to vLLM's KV manager (SURVEY.md §1
L5; the plugin only consumes the resulting ``block_table``/``slot_mapping``,
reference backend/triton_attn.py:60-103).  Here it is first-class:

* **Page pool**: fixed set of physical pages (matching the preallocated
  cache arrays on device); O(1) allocate/free via a free list.
* **Prefix caching**: a *full* block whose token content is known is
  published under a chain hash ``h_i = hash(h_{i-1}, tokens_i)``; a new
  request with the same prompt prefix maps its leading blocks to the cached
  pages (ref-counted) and skips recomputing them.  Evicted lazily: freed
  cached blocks go to an LRU pool and are reused only when the free list is
  empty (vLLM-style eviction).

Pure host-side Python by design: allocation runs while the TPU executes the
previous step, so it is off the critical path; the device only ever sees the
resulting int32 tables.  (A C++ pool exists for scale — see
csrc/page_pool — this module is the reference implementation and fallback.)
"""

from __future__ import annotations

from collections import OrderedDict
from dataclasses import dataclass, field


@dataclass
class SeqBlocks:
    """Block state of one sequence."""

    pages: list[int] = field(default_factory=list)
    # number of leading tokens whose KV came from the prefix cache
    num_cached_tokens: int = 0
    # chain hashes for each owned *full* block (parallel to pages prefix)
    hashes: list[int] = field(default_factory=list)


class BlockAllocator:
    def __init__(
        self,
        num_blocks: int,
        block_size: int,
        enable_prefix_caching: bool = True,
    ):
        self.num_blocks = num_blocks
        self.block_size = block_size
        self.enable_prefix_caching = enable_prefix_caching
        self._free: list[int] = list(range(num_blocks - 1, -1, -1))
        self._refcount: dict[int, int] = {}
        # content hash -> page id (published full blocks)
        self._cache: dict[int, int] = {}
        self._page_hash: dict[int, int] = {}
        # pages with refcount 0 that still hold cached content (LRU)
        self._evictable: OrderedDict[int, None] = OrderedDict()
        self._seqs: dict[str, SeqBlocks] = {}

    # ---------------- pool primitives ----------------

    @property
    def num_free_blocks(self) -> int:
        return len(self._free) + len(self._evictable)

    def _pop_page(self) -> int:
        if self._free:
            return self._free.pop()
        if self._evictable:
            page, _ = self._evictable.popitem(last=False)  # LRU
            h = self._page_hash.pop(page, None)
            if h is not None and self._cache.get(h) == page:
                del self._cache[h]
            return page
        raise MemoryError("page pool exhausted")

    def _incref(self, page: int):
        self._refcount[page] = self._refcount.get(page, 0) + 1
        self._evictable.pop(page, None)

    def _decref(self, page: int):
        self._refcount[page] -= 1
        if self._refcount[page] == 0:
            del self._refcount[page]
            if page in self._page_hash:
                self._evictable[page] = None  # keep content, evict lazily
            else:
                self._free.append(page)

    # ---------------- sequence API ----------------

    @staticmethod
    def block_hash(prev_hash: int, tokens: tuple[int, ...]) -> int:
        return hash((prev_hash, tokens))

    def allocate(self, seq_id: str, prompt: list[int]) -> SeqBlocks:
        """Admit a sequence: match cached prefix blocks, then allocate fresh
        pages for the rest of the prompt.  Returns the SeqBlocks record
        (``num_cached_tokens`` tells the scheduler what to skip)."""
        assert seq_id not in self._seqs
        sb = SeqBlocks()
        bs = self.block_size
        n_full = len(prompt) // bs
        prev = 0
        matched = 0
        if self.enable_prefix_caching:
            for i in range(n_full):
                chunk = tuple(prompt[i * bs : (i + 1) * bs])
                h = self.block_hash(prev, chunk)
                page = self._cache.get(h)
                if page is None:
                    break
                sb.pages.append(page)
                sb.hashes.append(h)
                self._incref(page)
                prev = h
                matched += 1
        # don't cache-hit the entire prompt: the last token's logits must
        # still be computed, so leave at least one token uncached
        if matched * bs == len(prompt) and matched > 0:
            page = sb.pages.pop()
            sb.hashes.pop()
            self._decref(page)
            matched -= 1
        sb.num_cached_tokens = matched * bs
        # fresh pages for the remainder
        needed = -(-len(prompt) // bs) - matched
        for _ in range(needed):
            page = self._pop_page()
            sb.pages.append(page)
            self._incref(page)
        self._seqs[seq_id] = sb
        return sb

    def can_allocate(self, prompt_len: int) -> bool:
        return self.num_free_blocks >= -(-prompt_len // self.block_size)

    def append_slots(self, seq_id: str, seq_len: int) -> None:
        """Ensure the sequence has pages covering ``seq_len`` tokens."""
        sb = self._seqs[seq_id]
        while len(sb.pages) * self.block_size < seq_len:
            page = self._pop_page()
            sb.pages.append(page)
            self._incref(page)

    def publish_full_blocks(self, seq_id: str, tokens: list[int]) -> None:
        """Register content hashes for now-complete blocks (prefix cache)."""
        if not self.enable_prefix_caching:
            return
        sb = self._seqs[seq_id]
        bs = self.block_size
        n_full = len(tokens) // bs
        prev = sb.hashes[-1] if sb.hashes else 0
        for i in range(len(sb.hashes), n_full):
            chunk = tuple(tokens[i * bs : (i + 1) * bs])
            h = self.block_hash(prev, chunk)
            page = sb.pages[i]
            sb.hashes.append(h)
            if h not in self._cache:
                self._cache[h] = page
                self._page_hash[page] = h
            prev = h

    def free(self, seq_id: str) -> None:
        sb = self._seqs.pop(seq_id)
        for page in sb.pages:
            self._decref(page)

    def block_table(self, seq_id: str) -> list[int]:
        return self._seqs[seq_id].pages

    def num_cached_tokens(self, seq_id: str) -> int:
        return self._seqs[seq_id].num_cached_tokens


class CPBlockAllocator:
    """Context-parallel page pools: position range ``[c*chunk_len,
    (c+1)*chunk_len)`` of every sequence lives in chip ``c``'s pool.

    Same duck-typed interface as :class:`BlockAllocator` (the scheduler
    is oblivious); ``block_table`` returns position-ordered LOCAL page
    ids — entry ``j`` is a page in pool ``j // (chunk_len/block_size)``,
    so the sharded forward derives each chip's local table as the
    contiguous slice ``table[:, c*ppc:(c+1)*ppc]`` and slot ownership
    from ``position // chunk_len`` (parallel/context.py).  Prefix caching
    is off (content pages would have to co-reside on one chip).
    """

    def __init__(
        self,
        num_chips: int,
        local_blocks: int,
        block_size: int,
        chunk_len: int,
    ):
        assert chunk_len % block_size == 0
        self.num_chips = num_chips
        self.num_blocks = local_blocks  # per-chip pool (tables hold
        # LOCAL page ids — the VTB_DEBUG metadata guard checks these)
        self.block_size = block_size
        self.chunk_len = chunk_len
        self.ppc = chunk_len // block_size  # pages per chip per seq
        self.enable_prefix_caching = False
        self._free: list[list[int]] = [
            list(range(local_blocks - 1, -1, -1))
            for _ in range(num_chips)
        ]
        self._seqs: dict[str, list[int]] = {}

    @property
    def num_free_blocks(self) -> int:
        # conservative: growth happens chip-by-chip in position order
        return min(len(f) for f in self._free)

    def _chip_pages_needed(self, n_tokens: int) -> list[int]:
        out = []
        for c in range(self.num_chips):
            local = min(
                max(n_tokens - c * self.chunk_len, 0), self.chunk_len
            )
            out.append(-(-local // self.block_size))
        return out

    def can_allocate(self, prompt_len: int) -> bool:
        return all(
            need <= len(self._free[c])
            for c, need in enumerate(self._chip_pages_needed(prompt_len))
        )

    def allocate(self, seq_id: str, prompt: list[int]) -> SeqBlocks:
        assert seq_id not in self._seqs
        self._seqs[seq_id] = []
        self.append_slots(seq_id, len(prompt))
        sb = SeqBlocks(pages=self._seqs[seq_id])
        return sb

    def append_slots(self, seq_id: str, seq_len: int) -> None:
        pages = self._seqs[seq_id]
        n = -(-seq_len // self.block_size)
        while len(pages) < n:
            chip = len(pages) // self.ppc
            if chip >= self.num_chips:
                raise MemoryError(
                    "sequence exceeds context-parallel capacity"
                )
            if not self._free[chip]:
                raise MemoryError("page pool exhausted")
            pages.append(self._free[chip].pop())

    def publish_full_blocks(self, seq_id: str, tokens: list[int]) -> None:
        return  # no prefix cache under CP

    def free(self, seq_id: str) -> None:
        pages = self._seqs.pop(seq_id)
        for j, page in enumerate(pages):
            self._free[j // self.ppc].append(page)

    def block_table(self, seq_id: str) -> list[int]:
        return self._seqs[seq_id]

    def num_cached_tokens(self, seq_id: str) -> int:
        return 0
