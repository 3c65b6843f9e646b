"""Device ARPA scorer vs the host ArpaLM oracle (decoding/ngram.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from efficientconformer_tpu.decoding.ngram import ArpaLM
from efficientconformer_tpu.decoding.ngram_device import DeviceNgram

from tests.test_decoding import ARPA


def write_arpa(tmp_path, text):
    p = tmp_path / "lm.arpa"
    p.write_text(text)
    return str(p)


TRIGRAM = """\\data\\
ngram 1=5
ngram 2=5
ngram 3=3

\\1-grams:
-1.0\t<s>\t-0.5
-0.8\ta\t-0.3
-1.2\tb\t-0.2
-1.5\tc\t-0.1
-2.0\td

\\2-grams:
-0.2\t<s> a\t-0.4
-0.4\ta b\t-0.25
-0.6\tb a\t-0.15
-0.7\tb c\t0.1
-0.9\tc a

\\3-grams:
-0.1\t<s> a b
-0.3\ta b a
-0.5\tb a b

\\end\\
"""


@pytest.mark.parametrize("text,offset", [(ARPA, 0), (TRIGRAM, 0)])
def test_device_matches_host_on_random_walks(tmp_path, text, offset):
    """Random token walks: every step's score AND the resulting state
    behaviour must match the host scorer (state equality is checked
    behaviourally — identical scores forever after)."""
    path = write_arpa(tmp_path, text)
    host = ArpaLM(path, ngram_offset=offset)
    vocab = 8
    dev = DeviceNgram(host, vocab_size=vocab)

    rng = np.random.default_rng(0)
    n_walks, steps = 16, 12
    toks = rng.integers(0, vocab, (n_walks, steps))

    # host: sequential per walk
    want = np.zeros((n_walks, steps))
    for i in range(n_walks):
        st = host.start_state()
        for j in range(steps):
            sc, st = host.score(st, int(toks[i, j]))
            want[i, j] = sc

    # device: vectorised over walks
    node = dev.start_state((n_walks,))
    got = np.zeros((n_walks, steps))
    for j in range(steps):
        sc, node = dev.score(node, jnp.asarray(toks[:, j]))
        got[:, j] = np.asarray(sc)

    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_context_node_rebuild_matches_incremental(tmp_path):
    """context_node (rebuild from a token buffer) must reach the same state
    as incremental advance from <s> — checked behaviourally: identical
    scores for every next token."""
    path = write_arpa(tmp_path, TRIGRAM)
    host = ArpaLM(path, ngram_offset=0)
    dev = DeviceNgram(host, vocab_size=8)

    rng = np.random.default_rng(3)
    n_walks, steps = 8, 9
    toks = rng.integers(0, 8, (n_walks, steps))

    node = dev.start_state((n_walks,))
    buf = np.zeros((n_walks, steps), np.int32)
    for j in range(steps):
        buf[:, j] = toks[:, j]
        node = dev.advance_node(node, jnp.asarray(toks[:, j]))
        rebuilt = dev.context_node(
            jnp.asarray(buf), jnp.full((n_walks,), j + 1, jnp.int32)
        )
        for probe in range(8):
            p = jnp.full((n_walks,), probe, jnp.int32)
            np.testing.assert_allclose(
                np.asarray(dev.score_from(rebuilt, p)),
                np.asarray(dev.score_from(node, p)),
                rtol=1e-6, atol=1e-6,
            )


def test_device_score_bounds(tmp_path):
    path = write_arpa(tmp_path, TRIGRAM)
    host = ArpaLM(path, ngram_offset=0)
    dev = DeviceNgram(host, vocab_size=8)
    rng = np.random.default_rng(1)
    node = dev.start_state((32,))
    for j in range(6):
        sc, node = dev.score(node, jnp.asarray(rng.integers(0, 8, (32,))))
        assert float(jnp.max(sc)) <= dev.score_max + 1e-6
        assert float(jnp.min(sc)) >= dev.score_min - 1e-6


def test_device_ngram_at_6gram_scale(tmp_path):
    """LibriSpeech-shaped scale (VERDICT r2 item #4): order 6, vocab 256
    (chr+100 mapping like the reference's 6gram_256.arpa), hundreds of
    thousands of entries. Validates the CSR packing end-to-end at a scale
    where the previous packed-key design's int32 budget was the risk:
    device scores == host oracle on random walks, and the device tables'
    byte footprint is accounted."""
    import time

    from tests.ngram_synth import synth_arpa

    path = str(tmp_path / "big6.arpa")
    counts = synth_arpa(path, vocab=256, order=6,
                        counts=(0, 20_000, 40_000, 60_000, 60_000, 60_000))
    total = sum(counts.values())
    assert total > 200_000

    t0 = time.time()
    host = ArpaLM(path, ngram_offset=100)
    t_parse = time.time() - t0
    t0 = time.time()
    dev = DeviceNgram(host, vocab_size=256)
    t_pack = time.time() - t0

    # every context of order < 6 is a node; all entries are reachable
    n_nodes = int(dev.score_starts.shape[0]) - 1
    assert n_nodes == 1 + sum(counts[k] for k in range(1, 6))
    assert int(dev.score_wids.shape[0]) == total
    # fanout-bounded bisection: depth covers vocab, not table size
    assert dev._bsearch_steps <= 10

    nbytes = sum(
        int(np.asarray(a).nbytes)
        for a in (dev.score_starts, dev.score_wids, dev.score_vals,
                  dev.trans_starts, dev.trans_wids, dev.trans_vals,
                  dev.backoff, dev.suffix, dev.length, dev.token_wid)
    )
    # linear-size tables: a few MB here, => tens of MB for a real 10M-entry
    # 6-gram — comfortably HBM-resident
    assert nbytes < 50 * total
    print(f"scale: {total} entries, {n_nodes} nodes, {nbytes/1e6:.1f} MB, "
          f"parse {t_parse:.1f}s pack {t_pack:.1f}s")

    # random walks: device == host, including backoff/unknown paths
    rng = np.random.default_rng(1)
    n_walks, steps = 8, 10
    toks = rng.integers(0, 256, (n_walks, steps))
    want = np.zeros((n_walks, steps))
    for i in range(n_walks):
        st = host.start_state()
        for j in range(steps):
            sc, st = host.score(st, int(toks[i, j]))
            want[i, j] = sc
    node = dev.start_state((n_walks,))
    got = np.zeros((n_walks, steps))
    for j in range(steps):
        sc, node = dev.score(node, jnp.asarray(toks[:, j]))
        got[:, j] = np.asarray(sc)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # deep-context walks: drive along REAL 6-gram entries so every lookup
    # depth (full hit at order 6 down to unigram fallback) is exercised
    entries = [k for k in host.table if len(k) == 6][:16]
    inv = {chr(i + 100): i for i in range(256)}
    for t in entries:
        if not all(w in inv for w in t):
            continue  # contexts containing <s>
        st = host.start_state()
        node = dev.start_state(())
        for w in t:
            sc_h, st = host.score(st, inv[w])
            sc_d, node = dev.score(node, jnp.asarray(inv[w]))
            np.testing.assert_allclose(float(sc_d), sc_h, rtol=1e-5,
                                       atol=1e-5)


@pytest.mark.slow
def test_device_ngram_at_1m_scale(tmp_path):
    """True 1M+ entry scale (VERDICT r3 Weak #6 / Next #7): the plausible
    size of the reference's real ``6gram_256.arpa``. Validates ARPA parse,
    CSR pack (build time is the untested axis at this size), HBM footprint
    linearity, and device==host scoring on random walks."""
    import time

    from tests.ngram_synth import synth_arpa

    path = str(tmp_path / "big1m.arpa")
    t0 = time.time()
    counts = synth_arpa(path, vocab=256, order=6,
                        counts=(0, 60_000, 230_000, 250_000, 250_000,
                                250_000))
    t_synth = time.time() - t0
    total = sum(counts.values())
    assert total >= 1_000_000, total

    t0 = time.time()
    host = ArpaLM(path, ngram_offset=100)
    t_parse = time.time() - t0
    t0 = time.time()
    dev = DeviceNgram(host, vocab_size=256)
    t_pack = time.time() - t0

    nbytes = sum(
        int(np.asarray(a).nbytes)
        for a in (dev.score_starts, dev.score_wids, dev.score_vals,
                  dev.trans_starts, dev.trans_wids, dev.trans_vals,
                  dev.backoff, dev.suffix, dev.length, dev.token_wid)
    )
    assert nbytes < 50 * total  # linear tables, HBM-resident at 10M too
    assert dev._bsearch_steps <= 10
    print(f"1M scale: {total} entries, {nbytes/1e6:.1f} MB device tables, "
          f"synth {t_synth:.1f}s parse {t_parse:.1f}s pack {t_pack:.1f}s")

    rng = np.random.default_rng(5)
    n_walks, steps = 8, 12
    toks = rng.integers(0, 256, (n_walks, steps))
    want = np.zeros((n_walks, steps))
    for i in range(n_walks):
        st = host.start_state()
        for j in range(steps):
            sc, st = host.score(st, int(toks[i, j]))
            want[i, j] = sc
    node = dev.start_state((n_walks,))
    got = np.zeros((n_walks, steps))
    for j in range(steps):
        sc, node = dev.score(node, jnp.asarray(toks[:, j]))
        got[:, j] = np.asarray(sc)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
