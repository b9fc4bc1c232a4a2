"""Continuous-batching inference engine over paged KV caches.

Replaces the reference's CUDA-graph decode machinery
(flash_attn/utils/generation.py:202-300 DecodingCGCache / capture_graph /
seqlen bucketing): on TPU, one jitted decode step per batch-size bucket gives
the same replay behavior (XLA caches the executable; shapes are static), and
the paged allocator supplies what CUDA graphs cannot — requests of different
lengths entering and leaving the batch without re-capture.

Design:
  * fixed `max_batch` slots; each active request owns a slot and a list of
    physical pages (host-side free-list allocator — the scheduler is host
    logic, the data never leaves HBM);
  * prefill runs the model once per request (prompt padded to a bucket) with
    a contiguous temporary cache, then the tokens are scattered into pages;
  * decode steps run all active slots together: one token per slot through
    the model with per-layer PagedKVCache and per-sample lengths;
  * inactive slots keep lengths=0 so their kernels' KV loop exits after the
    clamped first block (cheap) and their sampled tokens are discarded.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .paged import PagedKVCache

__all__ = ["Request", "InferenceEngine"]


@jax.jit
def _scatter_prefill(caches, new_kv, page_map, slot_ids, lengths_new):
    """Scatter bucketed prefill K/V into their pages: ONE device dispatch
    for all layers x requests x blocks. (The previous per-block
    dynamic_update_slice loop issued ~layers*blocks*2 dispatches, i.e.
    seconds per admit through the ~30ms-per-dispatch tunnel.)

    page_map: (nb, cap // page_size) int32 physical page per (request,
    block); unused blocks point at the engine's trash page (a write sink).
    slot_ids: (nb,) int32 batch slot per request (targets the linear
    per-sequence scale buffer). lengths_new: (max_batch,) replacement
    lengths vector (host-computed).
    """
    from ..ops.quant import quantize_kv

    idx = page_map.reshape(-1)
    out = []
    for cache, (kc, vc) in zip(caches, new_kv):
        nb, hk, cap, d = kc.shape
        ps = cache.page_size
        nblk = -(-cap // ps)
        if cap != nblk * ps:  # bucket smaller than a page: pad to one page
            pad = nblk * ps - cap
            kc = jnp.pad(kc, ((0, 0), (0, 0), (0, pad), (0, 0)))
            vc = jnp.pad(vc, ((0, 0), (0, 0), (0, pad), (0, 0)))
            cap = nblk * ps

        def blocks2(k, v, dtype):
            def bl(x):
                xb = x.reshape(nb, hk, nblk, ps, d).transpose(0, 2, 1, 3, 4)
                return xb.reshape(nb * nblk, hk, ps, d)

            # (nb*nblk, hk, 2, ps, d) — packed page records
            return jnp.stack([bl(k), bl(v)], axis=2).astype(dtype)

        if cache.quantized:
            kq = quantize_kv(kc, cache.kv_pages.dtype)
            vq = quantize_kv(vc, cache.kv_pages.dtype)
            kvals, vvals = kq.values, vq.values
            # linear per-sequence scales: write rows [slot, :, :, :cap]
            sc = jnp.stack([
                jnp.swapaxes(kq.scales[..., 0], 1, 2),   # (nb, cap, hk)
                jnp.swapaxes(vq.scales[..., 0], 1, 2),
            ], axis=-1)                                   # (nb, cap, hk, 2)
            posc = jnp.arange(cap, dtype=jnp.int32)
            kv_scales = cache.kv_scales.at[
                slot_ids[:, None], :, :, posc[None, :]].set(
                    sc, mode="drop")
        else:
            kvals, vvals = kc, vc
            kv_scales = cache.kv_scales
        out.append(dataclasses.replace(
            cache,
            kv_pages=cache.kv_pages.at[idx].set(
                blocks2(kvals, vvals, cache.kv_pages.dtype)),
            kv_scales=kv_scales,
            lengths=lengths_new,
        ))
    return out


@dataclasses.dataclass
class Request:
    rid: int
    prompt: np.ndarray                  # (prompt_len,) int32
    max_new_tokens: int = 32
    temperature: float = 0.0            # 0 => greedy
    eos_token_id: Optional[int] = None
    # filled by the engine
    output: List[int] = dataclasses.field(default_factory=list)
    slot: int = -1
    pages: List[int] = dataclasses.field(default_factory=list)
    prefill_pos: int = 0                # prompt tokens already in cache


def _bucket(n: int, buckets=(32, 64, 128, 256, 512, 1024, 2048, 4096)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return -(-n // 4096) * 4096


class InferenceEngine:
    """model_apply(params, input_ids, kv_caches, seqlen_offset)
    -> (logits, new_kv_caches); GPTLMHeadModel.apply fits directly."""

    def __init__(
        self,
        model_apply: Callable,
        params: Any,
        *,
        num_layers: int,
        num_kv_heads: int,
        head_dim: int,
        num_pages: int = 256,
        # pages are the decode DMA unit: v5e measured 32/52/74% of HBM BW at
        # page 256/512/1024 — larger pages trade allocator granularity for
        # bandwidth; 512 is the balanced default
        page_size: int = 512,
        max_batch: int = 8,
        max_pages_per_seq: int = 32,
        dtype=jnp.bfloat16,
        # chunked-prefill admission (≙ FA3 chunked prefill / vLLM-style
        # latency bounding): prompts longer than this prefill in
        # `prefill_chunk`-token pieces interleaved with decode steps, so
        # one long admit never stalls the running batch for a full-prompt
        # forward. None = whole-prompt bucketed prefill.
        prefill_chunk: Optional[int] = None,
        # prompt-lookup speculative decoding (greedy slots only): propose
        # up to `speculate_len` draft tokens by matching the trailing
        # `speculate_ngram`-gram against the request's own history, then
        # verify them all in ONE multi-token dispatch. Rejected drafts
        # cost nothing extra: the host length mirror is re-pushed before
        # every dispatch, so their appended KV is simply overwritten —
        # the same rollback-free mechanism chunked prefill uses.
        speculate_len: int = 0,
        speculate_ngram: int = 2,
    ):
        self.model_apply = model_apply
        self.params = params
        self.page_size = page_size
        self.max_batch = max_batch
        self.max_pages_per_seq = max_pages_per_seq
        self.prefill_chunk = prefill_chunk
        self._prefilling: List[Request] = []
        self._prefill_fns: Dict[int, Callable] = {}
        self.speculate_len = speculate_len
        self.speculate_ngram = speculate_ngram
        self._verify_fn = None
        self.trash_page = num_pages - 1  # sink for inactive-slot appends
        self.caches = []
        for _ in range(num_layers):
            c = PagedKVCache.create(
                num_pages, num_kv_heads, page_size, head_dim,
                max_batch, max_pages_per_seq, dtype,
            )
            c.page_table = jnp.full_like(c.page_table, self.trash_page)
            self.caches.append(c)
        # page table + lengths live host-side (the scheduler is host logic);
        # they are pushed to the device caches once per jitted call instead
        # of one device-scatter dispatch per allocation
        self._table = np.full((max_batch, max_pages_per_seq), self.trash_page,
                              np.int32)
        self._lengths = np.zeros((max_batch,), np.int32)
        self.free_pages = list(range(num_pages - 2, -1, -1))
        self.slots: List[Optional[Request]] = [None] * max_batch
        self.waiting: List[Request] = []
        self.finished: List[Request] = []
        self._decode_fn = None
        self._last_tokens = np.zeros((max_batch,), np.int32)
        self._rng = np.random.default_rng(0)

    # ---- paging -----------------------------------------------------------

    def _alloc_page(self, req: Request) -> int:
        if not self.free_pages:
            raise RuntimeError("out of KV pages")
        p = self.free_pages.pop()
        req.pages.append(p)
        self._table[req.slot, len(req.pages) - 1] = p
        return p

    def _release(self, req: Request):
        self.free_pages.extend(req.pages)
        req.pages.clear()
        self._table[req.slot] = self.trash_page
        self._lengths[req.slot] = 0
        self.slots[req.slot] = None
        req.slot = -1

    def _sync_caches(self):
        """Push the host page table / lengths into every layer cache (one
        shared device array each)."""
        table = jnp.asarray(self._table)
        lengths = jnp.asarray(self._lengths)
        self.caches = [
            dataclasses.replace(c, page_table=table, lengths=lengths)
            for c in self.caches
        ]

    # ---- scheduling -------------------------------------------------------

    def add_request(self, req: Request):
        self.waiting.append(req)

    def _admit(self):
        admitted = []
        for i in range(self.max_batch):
            if not self.waiting:
                break
            if self.slots[i] is None:
                req = self.waiting.pop(0)
                req.slot = i
                self.slots[i] = req
                admitted.append(req)
        # long prompts go through chunked prefill (one chunk per engine
        # step, interleaved with decode); short ones keep the one-shot
        # bucketed prefill below
        direct = []
        for r in admitted:
            if (self.prefill_chunk is not None
                    and len(r.prompt) > self.prefill_chunk):
                self._lengths[r.slot] = 0
                self._prefilling.append(r)
            else:
                direct.append(r)
        # batch the prefills of requests landing in the same length bucket
        # (one forward per bucket instead of one per request)
        by_bucket = {}
        for r in direct:
            by_bucket.setdefault(_bucket(len(r.prompt)), []).append(r)
        for cap, reqs in by_bucket.items():
            self._prefill_batch(reqs, cap)

    def _prefill_chunk_step(self):
        """Advance every in-prefill request by one `prefill_chunk`-token
        piece: ONE batched dispatch through the model's paged chunked-
        prefill path (multi-token append_paged_kv + sq>1 paged decode
        kernel; modules/mha.py paged branch). Slots not in prefill append
        garbage beyond their committed host length — harmless: the host
        length mirror is re-pushed before every dispatch, so the next real
        append overwrites it and reads never see past `lengths`."""
        if not self._prefilling:
            return
        chunk = self.prefill_chunk
        ids = np.zeros((self.max_batch, chunk), np.int32)
        for r in self._prefilling:
            n = min(chunk, len(r.prompt) - r.prefill_pos)
            ids[r.slot, :n] = np.asarray(
                r.prompt[r.prefill_pos:r.prefill_pos + n], np.int32)
            need_pages = -(-(r.prefill_pos + n) // self.page_size)
            while len(r.pages) < min(need_pages, self.max_pages_per_seq):
                self._alloc_page(r)
        self._sync_caches()
        fn = self._prefill_fns.get(chunk)
        if fn is None:
            apply = self.model_apply

            def pf(params, ids, caches):
                lengths = caches[0].lengths
                return apply(params, ids, kv_caches=caches,
                             seqlen_offset=lengths)

            fn = self._prefill_fns[chunk] = jax.jit(pf)
        logits, self.caches = fn(self.params, jnp.asarray(ids), self.caches)
        still = []
        for r in self._prefilling:
            n = min(chunk, len(r.prompt) - r.prefill_pos)
            r.prefill_pos += n
            self._lengths[r.slot] = r.prefill_pos
            if r.prefill_pos >= len(r.prompt):
                tok = self._sample(np.asarray(logits[r.slot, n - 1]), r)
                r.output.append(tok)
                self._last_tokens[r.slot] = tok
            else:
                still.append(r)
        self._prefilling = still

    # ---- prefill ----------------------------------------------------------

    def _prefill_batch(self, reqs, cap: int):
        nb = len(reqs)
        ids = np.zeros((nb, cap), np.int32)
        seg = np.zeros((nb, cap), np.int32)
        lens = [len(r.prompt) for r in reqs]
        for j, r in enumerate(reqs):
            ids[j, :lens[j]] = np.asarray(r.prompt, np.int32)
            seg[j, :lens[j]] = 1
        # contiguous scratch cache for the prompts, then scatter into pages
        # (scratch stays float — quantization happens at page-write time)
        hk = self.caches[0].k_pages.shape[1]
        d = self.caches[0].k_pages.shape[3]
        dt = self.caches[0].k_pages.dtype
        if jnp.dtype(dt) in (jnp.dtype(jnp.int8),
                             jnp.dtype(jnp.float8_e4m3fn)):
            dt = jnp.bfloat16
        scratch = [
            (jnp.zeros((nb, hk, cap, d), dt), jnp.zeros((nb, hk, cap, d), dt))
            for _ in self.caches
        ]
        logits, new_caches = self.model_apply(
            self.params, jnp.asarray(ids), kv_caches=scratch,
            seqlen_offset=0, segment_ids=jnp.asarray(seg),
        )
        nblk = -(-cap // self.page_size)
        page_map = np.full((nb, nblk), self.trash_page, np.int32)
        for j, req in enumerate(reqs):
            n = lens[j]
            nblocks = -(-n // self.page_size)
            while len(req.pages) < nblocks:
                self._alloc_page(req)
            page_map[j, :nblocks] = req.pages[:nblocks]
            self._lengths[req.slot] = n
        self.caches = _scatter_prefill(
            self.caches, new_caches, jnp.asarray(page_map),
            jnp.asarray([r.slot for r in reqs], np.int32),
            jnp.asarray(self._lengths),
        )
        self._sync_caches()
        for j, req in enumerate(reqs):
            tok = self._sample(np.asarray(logits[j, lens[j] - 1]), req)
            req.output.append(tok)
            self._last_tokens[req.slot] = tok

    # ---- decode -----------------------------------------------------------

    def _sample(self, logits: np.ndarray, req: Request) -> int:
        if req.temperature <= 0.0:
            return int(np.argmax(logits))
        p = np.exp((logits - logits.max()) / req.temperature)
        p = p / p.sum()
        return int(self._rng.choice(len(p), p=p))

    def _build_decode(self):
        apply = self.model_apply

        def step(params, tokens, caches):
            lengths = caches[0].lengths
            logits, new_caches = apply(
                params, tokens[:, None], kv_caches=caches,
                seqlen_offset=lengths,
            )
            return logits[:, 0], new_caches

        return jax.jit(step)

    # ---- speculative decode (prompt lookup) -------------------------------

    def _propose(self, r: Request) -> List[int]:
        """Draft up to speculate_len tokens: find the most recent earlier
        occurrence of the trailing n-gram in the request's own history
        (prompt + generated) and copy what followed it (the vLLM
        "prompt lookup"/ngram speculator). Empty when no match."""
        n, K = self.speculate_ngram, self.speculate_len
        hist = list(r.prompt) + r.output
        if len(hist) <= n:
            return []
        tail = hist[-n:]
        # scan backwards over earlier positions
        for i in range(len(hist) - n - 1, -1, -1):
            if hist[i:i + n] == tail:
                cont = hist[i + n:i + n + K]
                if cont:
                    return [int(t) for t in cont]
        return []

    def _build_verify(self, width: int):
        apply = self.model_apply

        def step(params, tokens, caches):
            lengths = caches[0].lengths
            logits, new_caches = apply(
                params, tokens, kv_caches=caches, seqlen_offset=lengths,
            )
            return logits, new_caches

        return jax.jit(step)

    def _finish_tokens(self, r: Request, toks: List[int]):
        """Append emitted tokens, honoring eos/max_new; returns committed
        count actually kept (tokens after a cut are dropped)."""
        kept = 0
        for tok in toks:
            r.output.append(tok)
            self._last_tokens[r.slot] = tok
            kept += 1
            if (len(r.output) >= r.max_new_tokens
                    or (r.eos_token_id is not None
                        and tok == r.eos_token_id)):
                self._release(r)
                self.finished.append(r)
                return kept
        return kept

    def _decode_speculative(self, active):
        K = self.speculate_len
        width = 1 + K
        ids = np.zeros((self.max_batch, width), np.int32)
        drafts: Dict[int, List[int]] = {}
        for r in active:
            d = self._propose(r) if r.temperature <= 0.0 else []
            drafts[r.slot] = d
            ids[r.slot, 0] = self._last_tokens[r.slot]
            ids[r.slot, 1:1 + len(d)] = d
            # pages must cover the whole appended width
            need = -(-(self._lengths[r.slot] + width) // self.page_size)
            while len(r.pages) < min(need, self.max_pages_per_seq):
                self._alloc_page(r)
        self._sync_caches()
        if self._verify_fn is None:
            self._verify_fn = self._build_verify(width)
        logits, self.caches = self._verify_fn(
            self.params, jnp.asarray(ids), self.caches
        )
        logits_np = np.asarray(logits)
        for r in active:
            d = drafts[r.slot]
            emitted = []
            m = 0  # matched drafts (their KV is already committed)
            for i in range(len(d) + 1):
                if r.temperature <= 0.0:
                    tok = int(np.argmax(logits_np[r.slot, i]))
                else:
                    tok = self._sample(logits_np[r.slot, i], r)
                emitted.append(tok)
                if i < len(d) and tok == d[i]:
                    m += 1
                else:
                    break
            self._finish_tokens(r, emitted)
            if r.slot >= 0:  # not released by eos/max_new
                # committed cache tokens: last_token + matched drafts (the
                # final emitted token stays pending, like normal decode)
                self._lengths[r.slot] += 1 + m

    def step(self) -> List[Request]:
        """Admit waiting requests, advance chunked prefills by one chunk,
        run one decode step (speculative when enabled), return newly
        finished requests."""
        self._admit()
        self._prefill_chunk_step()
        prefilling = set(id(r) for r in self._prefilling)
        active = [r for r in self.slots
                  if r is not None and id(r) not in prefilling]
        if not active:
            done, self.finished = self.finished, []
            return done
        if self.speculate_len > 0:
            self._decode_speculative(active)
            done, self.finished = self.finished, []
            return done
        # ensure a page exists for the next token of each active slot
        for r in active:
            need = (len(r.prompt) + len(r.output)) // self.page_size + 1
            while len(r.pages) < min(need, self.max_pages_per_seq):
                self._alloc_page(r)
        self._sync_caches()
        if self._decode_fn is None:
            self._decode_fn = self._build_decode()
        logits, new_caches = self._decode_fn(
            self.params, jnp.asarray(self._last_tokens), self.caches
        )
        self.caches = new_caches
        for r in active:
            # mirror the in-model append_paged_kv length increment
            self._lengths[r.slot] += 1
        logits_np = np.asarray(logits)
        for r in active:
            tok = self._sample(logits_np[r.slot], r)
            r.output.append(tok)
            self._last_tokens[r.slot] = tok
            done = (
                len(r.output) >= r.max_new_tokens
                or (r.eos_token_id is not None and tok == r.eos_token_id)
            )
            if done:
                self._release(r)
                self.finished.append(r)
        done, self.finished = self.finished, []
        return done

    def run(self) -> Dict[int, List[int]]:
        """Drive until every queued request completes."""
        results: Dict[int, List[int]] = {}
        while self.waiting or any(s is not None for s in self.slots):
            for r in self.step():
                results[r.rid] = r.output
        return results
