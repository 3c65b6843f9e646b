"""Device-resident ARPA n-gram scorer for on-device beam-search fusion.

The host beams score kenlm-style per token extension through Python dict
lookups (reference models/transducer.py:309-317; decoding/ngram.ArpaLM is
the in-repo equivalent). That forces n-gram-fused beam search to stay
host-orchestrated. This module packs the ARPA model into sorted integer
arrays so the SAME backoff recursion runs inside jit, letting the fully
on-device beam (decoding/rnnt_beam_device.py) fuse n-gram scores too.

Representation (kenlm-like trie):
  * a NODE is a context tuple present in the table (any entry of order
    < N, plus the empty context, node 0). LM state per hypothesis is ONE
    int32 node id — fixed-shape, stack/gather friendly for beam slots.
  * per node: its backoff weight, its longest-proper-suffix node (the
    backoff chain), and its length.
  * scores: CSR layout over ALL entries whose context is a node (the ARPA
    prefix property): ``score_starts[node] .. score_starts[node+1]`` bounds
    a wid-sorted run of (wid, log10-prob) pairs. A lookup gathers the two
    row bounds then runs a fixed-depth vectorised binary search over the
    run — ceil(log2(max per-context fanout)) + 2 gathers, i.e. bounded by
    the *vocabulary* (<= 9 steps at vocab 256), not the table size, and
    with no packed-key width limit: node and entry counts scale to 2^31
    independently (a packed ``node << bits | wid`` int32 key would cap a
    real 6-gram's contexts at ~4M).
  * transitions: the same layout maps (node(t[:-1]), t[-1]) -> node(t)
    for every non-empty node, giving the longest-suffix state update.

Score/state semantics match ``decoding/ngram.ArpaLM.score_word`` exactly
for well-formed ARPA files (prefix property: every entry's context is
itself listed — true of kenlm/SRILM output). The equivalence tests check
against that oracle, including backoff and unknown-token paths, and
tests/test_ngram_device.py includes a millions-of-entries order-6 case
(the reference decodes with 6gram_256.arpa, configs/*.json).
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax.numpy as jnp

from efficientconformer_tpu.decoding.ngram import LOG10_UNK, ArpaLM


def _csr_pack(nodes, cols, vals, n_nodes, n_cols):
    """Sort (node, col, val) triples into CSR: row-pointer ``starts``
    (n_nodes+1), col-sorted ``cols``/``vals`` per row. Pure numpy — scales to
    tens of millions of entries."""
    nodes = np.asarray(nodes, np.int64)
    cols_a = np.asarray(cols, np.int64)
    order = np.argsort(nodes * (n_cols + 1) + cols_a, kind="stable")
    starts = np.zeros((n_nodes + 1,), np.int64)
    np.add.at(starts, nodes + 1, 1)
    np.cumsum(starts, out=starts)
    assert starts[-1] < 2 ** 31, "entry count overflows int32 offsets"
    return (
        starts.astype(np.int32),
        cols_a[order].astype(np.int32),
        np.asarray(vals)[order],
    )


class DeviceNgram:
    def __init__(self, arpa: ArpaLM, vocab_size: int):
        self.order = max(arpa.order, 1)
        words = sorted({w for key in arpa.table for w in key})
        word_id = {w: i for i, w in enumerate(words)}
        self.n_words = len(words)
        miss = self.n_words                    # never matches a real wid

        # ---- nodes: contexts (entries of order < N) + the empty context
        node_tuples = [()] + sorted(
            k for k in arpa.table if len(k) < self.order
        )
        node_id = {t: i for i, t in enumerate(node_tuples)}
        n_nodes = len(node_tuples)
        assert n_nodes < 2 ** 31, f"{n_nodes} contexts overflow int32 node ids"

        backoff = np.zeros((n_nodes,), np.float32)
        suffix = np.zeros((n_nodes,), np.int32)
        length = np.zeros((n_nodes,), np.int32)
        for t, i in node_id.items():
            if t in arpa.table:
                backoff[i] = arpa.table[t][1]
            length[i] = len(t)
            s = t[1:]
            while s and s not in node_id:
                s = s[1:]
            suffix[i] = node_id[s] if s else 0

        # ---- score table over ALL entries with a node context (CSR)
        snodes, swids, svals = [], [], []
        self._max_logp = LOG10_UNK
        self._min_logp = 0.0
        max_bo = 0.0
        min_bo = 0.0
        for t, (logp, bo) in arpa.table.items():
            self._max_logp = max(self._max_logp, logp)
            self._min_logp = min(self._min_logp, logp)
            max_bo = max(max_bo, bo)
            min_bo = min(min_bo, bo)
            ctx = t[:-1]
            if ctx not in node_id:
                continue  # ill-formed entry: unreachable from trimmed states
            snodes.append(node_id[ctx])
            swids.append(word_id[t[-1]])
            svals.append(logp)
        starts, wids, vals = _csr_pack(
            snodes, swids, np.asarray(svals, np.float32), n_nodes, self.n_words)
        self.score_starts = jnp.asarray(starts)
        self.score_wids = jnp.asarray(wids)
        self.score_vals = jnp.asarray(vals)

        # ---- transition table: (node(t[:-1]), t[-1]) -> node(t) (CSR)
        tnodes, twids, tvals = [], [], []
        for t, i in node_id.items():
            if not t:
                continue
            ctx = t[:-1]
            if ctx not in node_id:
                continue
            tnodes.append(node_id[ctx])
            twids.append(word_id[t[-1]])
            tvals.append(i)
        starts, wids, vals = _csr_pack(
            tnodes, twids, np.asarray(tvals, np.int32), n_nodes, self.n_words)
        self.trans_starts = jnp.asarray(starts)
        self.trans_wids = jnp.asarray(wids)
        self.trans_vals = jnp.asarray(vals)

        # fixed binary-search depth: rows are wid-sorted runs, so the longest
        # run is bounded by the per-context fanout (<= ARPA vocab), NOT the
        # table size — <= 9 steps at vocab 256 vs log2(entries) for a flat key
        max_fanout = max(
            int(np.max(np.diff(self.score_starts))) if len(svals) else 1,
            int(np.max(np.diff(self.trans_starts))) if len(tvals) else 1,
        )
        self._bsearch_steps = max(1, math.ceil(math.log2(max_fanout + 1)))

        self.backoff = jnp.asarray(backoff)
        self.suffix = jnp.asarray(suffix)
        self.length = jnp.asarray(length)

        # token id -> wid via the chr(id + offset) word convention
        tok_wid = np.full((vocab_size,), miss, np.int32)
        for t in range(vocab_size):
            w = chr(t + arpa.offset)
            if w in word_id:
                tok_wid[t] = word_id[w]
        self.token_wid = jnp.asarray(tok_wid)

        bos = ("<s>",)
        self._start = node_id.get(bos, 0) if bos in arpa.table else 0

        # exact static bounds on a single score() result, for fast-path
        # predicates: logp + up-to-(order-1) backoff additions
        self.score_max = self._max_logp + (self.order - 1) * max(0.0, max_bo)
        self.score_min = min(LOG10_UNK, self._min_logp) + (
            self.order - 1
        ) * min(0.0, min_bo)

    # ------------------------------------------------------------------ api

    @classmethod
    def from_arpa(cls, arpa_or_path, vocab_size: int,
                  ngram_offset: int = 100) -> "DeviceNgram":
        arpa = (
            arpa_or_path
            if isinstance(arpa_or_path, ArpaLM)
            else ArpaLM(arpa_or_path, ngram_offset)
        )
        return cls(arpa, vocab_size)

    def start_state(self, shape) -> jnp.ndarray:
        """Node ids for the start context (<s> if present)."""
        return jnp.full(shape, self._start, jnp.int32)

    def _lookup(self, starts, wids, vals, node, wid, default):
        """CSR row lookup: find ``wid`` in the wid-sorted run of ``node``.

        An unrolled fixed-depth binary search (like searchsorted's
        'scan_unrolled': lax.scan-based bisection inside the beam's
        while_loop nesting blew XLA compile time up 17x and ran ~100x
        slower on TPU), but over the per-node run only — depth is bounded
        by the max per-context fanout (the ARPA vocab), not the table."""
        if wids.shape[0] == 0:
            zero = jnp.zeros(node.shape, bool)
            return jnp.full(node.shape, default, vals.dtype), zero
        lo = starts[node]
        hi = starts[node + 1]
        for _ in range(self._bsearch_steps):
            active = lo < hi
            mid = (lo + hi) >> 1
            v = wids[jnp.minimum(mid, wids.shape[0] - 1)]
            go_right = active & (v < wid)
            lo = jnp.where(go_right, mid + 1, lo)
            hi = jnp.where(active & ~go_right, mid, hi)
        idx = jnp.minimum(lo, wids.shape[0] - 1)
        hit = (lo < starts[node + 1]) & (wids[idx] == wid)
        return jnp.where(hit, vals[idx], default), hit

    def score_from(self, node: jnp.ndarray, tok: jnp.ndarray) -> jnp.ndarray:
        """Backoff score of ``tok`` in context ``node``, vectorised over any
        shape (ArpaLM.score_word log-prob semantics)."""
        wid = self.token_wid[tok]
        cur = node
        acc = jnp.zeros(node.shape, jnp.float32)
        done = jnp.zeros(node.shape, bool)
        out = jnp.zeros(node.shape, jnp.float32)
        for _ in range(self.order):
            val, hit = self._lookup(self.score_starts, self.score_wids,
                                    self.score_vals, cur, wid, 0.0)
            out = jnp.where(~done & hit, val + acc, out)
            done = done | hit
            acc = acc + jnp.where(done, 0.0, self.backoff[cur])
            at_root = cur == 0
            # fell off the chain without a hit: unknown-word fallback
            out = jnp.where(~done & at_root, LOG10_UNK + acc, out)
            done = done | at_root
            cur = self.suffix[cur]
        return out

    def advance_node(self, node: jnp.ndarray, tok: jnp.ndarray) -> jnp.ndarray:
        """State update: node of the longest table suffix of (context + tok)."""
        wid = self.token_wid[tok]
        cur = jnp.where(self.length[node] >= self.order - 1,
                        self.suffix[node], node)
        if self.order == 1:
            return jnp.zeros_like(node)
        new_node = jnp.zeros_like(node)
        found = jnp.zeros(node.shape, bool)
        for _ in range(self.order - 1):
            val, hit = self._lookup(self.trans_starts, self.trans_wids,
                                    self.trans_vals, cur, wid, 0)
            new_node = jnp.where(~found & hit, val, new_node)
            found = found | hit
            stop = found | (cur == 0)
            cur = jnp.where(stop, cur, self.suffix[cur])
        return new_node

    def score(self, node: jnp.ndarray, tok: jnp.ndarray):
        """Backoff score + state update (ArpaLM.score semantics)."""
        return self.score_from(node, tok), self.advance_node(node, tok)

    def context_node(self, tokens: jnp.ndarray, n_tok: jnp.ndarray):
        """Rebuild the LM state node from a token-history buffer.

        tokens (..., U) int32, n_tok (...,) valid counts. The n-gram state
        depends only on the last order-1 tokens (any table context is that
        short), except that histories shorter than order-1 start from <s> —
        exactly the state the host scorer reaches incrementally. Lets beam
        searches score extensions WITHOUT threading LM state through their
        carries (measured: an extra carried per-slot array slowed the
        on-device beam's nested loops ~150x on v5e, while rebuilding from
        the already-carried token buffer is ~100 us per pop)."""
        k = self.order - 1
        if k == 0:
            return jnp.zeros(n_tok.shape, jnp.int32)
        node = jnp.where(n_tok < k, jnp.int32(self._start), jnp.int32(0))
        for i in range(k, 0, -1):
            pos = n_tok - i
            active = pos >= 0
            tok = jnp.take_along_axis(
                tokens, jnp.maximum(pos, 0)[..., None], axis=-1
            )[..., 0]
            node = jnp.where(active, self.advance_node(node, tok), node)
        return node


_CONVERT_CACHE: dict = {}


def as_device_ngram(ngram, vocab_size: int) -> Optional[DeviceNgram]:
    """Memoised ArpaLM -> DeviceNgram conversion. Callers key jit caches by
    ``id()`` of the scorer, so the conversion MUST return the same object
    for the same source model — a fresh DeviceNgram per call silently forces
    a full re-trace of the beam program on every invocation."""
    if ngram is None or isinstance(ngram, DeviceNgram):
        return ngram
    key = (id(ngram), vocab_size)
    dev = _CONVERT_CACHE.get(key)
    if dev is None:
        dev = DeviceNgram(ngram, vocab_size)
        # hold the source ArpaLM too so its id() cannot be recycled
        _CONVERT_CACHE[key] = (dev, ngram)
        return dev
    return dev[0]
