"""Deterministic, numpy-only text models shared by the Spark UDFs and the
pandas parity oracle.

* **langid** — a fastText-style hashed character-trigram linear classifier
  (hashed n-gram bag → per-language log-probability matrix → argmax +
  sigmoid-margin confidence). Trained at import time from the seeded
  vocabularies in ``corpus.vocab`` — no binary model deps, fully
  reproducible, small enough to ship via --py-files and re-derive on every
  executor.
* **perplexity** — a KenLM-flavoured character-trigram LM with stupid
  backoff (trigram → bigram → unigram → uniform), hashed-bucket count
  arrays so scoring is pure vectorized array indexing.

Both expose a *vectorized batch* path (used by the Arrow pandas UDFs:
one utf-32 decode per batch, stride-free trigram windows, ``np.bincount``
per-doc reduction — no per-row Python on the Spark side) and a *scalar*
path (used by the reference-style pandas oracle; intentionally a separate
straightforward implementation of the same math).

Reference analogs: the column-content heuristics + outlier scoring of
/root/reference/src/core/validator.py:161-242,270-294, generalized from
"does this column look like emails" to "does this transcript look like the
target language / like natural text".
"""

from __future__ import annotations

import math
import os
import re
from functools import lru_cache

import numpy as np

from ..corpus.vocab import EN_VOCAB, IT_VOCAB

N_BUCKETS = 1 << 18
_ALPHA = 0.5          # Laplace smoothing for langid
_BACKOFF = 0.4        # stupid-backoff discount
_VOCAB_SIZE = 27      # a-z + space
_TRAIN_SEED = 7
_TRAIN_SENTENCES = 4000

LANGS = ("en", "it")
_SEP = 0  # NUL separator between docs in the concatenated batch buffer

_NORM_RE = re.compile(r"[^a-z]+")


def normalize(text: str) -> str:
    """lowercase; any run of non-[a-z] becomes a single space."""
    return _NORM_RE.sub(" ", text.lower())


# --------------------------------------------------------------------------
# hashing — identical math in batch (uint64 ndarray) and scalar (int) form
# --------------------------------------------------------------------------

def _hash3(a, b, c):
    return ((a * np.uint64(1000003) + b) * np.uint64(1000003) + c) % np.uint64(N_BUCKETS)


def _hash2(a, b):
    return (a * np.uint64(1000003) + b) % np.uint64(N_BUCKETS)


def _hash3_s(a: int, b: int, c: int) -> int:
    return ((a * 1000003 + b) * 1000003 + c) % N_BUCKETS


def _hash2_s(a: int, b: int) -> int:
    return (a * 1000003 + b) % N_BUCKETS


# --------------------------------------------------------------------------
# training (import-time, deterministic)
# --------------------------------------------------------------------------

def _train_sentences(vocab: tuple[str, ...] | list[str], seed: int) -> list[str]:
    rng = np.random.default_rng(seed)
    out = []
    words = np.asarray(vocab)
    for _ in range(_TRAIN_SENTENCES):
        n = int(rng.integers(5, 20))
        out.append(" ".join(rng.choice(words, size=n)))
    return out


def _codes(text: str) -> np.ndarray:
    return np.frombuffer(normalize(text).encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)


# Trained-model disk cache: training costs ~0.9 s of numpy work, and with
# spark.python.worker.reuse every COLD run pays it once per Python worker
# (32× on local[32] — the dominant cold-start cost of the clips pipeline,
# BENCH_r02 clips_decisions 16.0 s cold vs 3.5 s warm). The arrays are
# pure deterministic constants, so the first builder persists them
# (tmp+rename, pid-suffixed: concurrent builders race safely and publish
# identical bytes) and every later process mmap-loads ~12 MB from page
# cache in ~10 ms. Cache key pins every training input. On a multi-host
# cluster /tmp is per-host: each host's first worker trains and seeds
# that host's cache (or ship the .npz via --files); results are
# bit-identical either way because training is seeded.
_CACHE_VERSION = 1


def _model_cache_path() -> str:
    return (
        f"/tmp/dqc_textmodel_v{_CACHE_VERSION}"
        f"_b{N_BUCKETS}_s{_TRAIN_SEED}_n{_TRAIN_SENTENCES}"
        f"_v{len(EN_VOCAB)}x{len(IT_VOCAB)}.npz"
    )


def _load_model_cache():
    path = _model_cache_path()
    if not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            return {
                "langid_logp": z["langid_logp"],
                "lm": (
                    z["lm_c3"], z["lm_c2ctx"], z["lm_c2"],
                    z["lm_c1ctx"], z["lm_c1"], float(z["lm_total"]),
                ),
            }
    except Exception:
        return None  # corrupt/partial cache: fall through to retrain


def _save_model_cache(models) -> None:
    path = _model_cache_path()
    tmp = f"{path}.tmp.{os.getpid()}"
    try:
        c3, c2ctx, c2, c1ctx, c1, total = models["lm"]
        with open(tmp, "wb") as f:
            np.savez(
                f,
                langid_logp=models["langid_logp"],
                lm_c3=c3, lm_c2ctx=c2ctx, lm_c2=c2,
                lm_c1ctx=c1ctx, lm_c1=c1,
                lm_total=np.float64(total),
            )
        os.replace(tmp, path)
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass


@lru_cache(maxsize=1)
def get_models():
    """Build (langid log-prob matrix, LM count arrays) once per process —
    loaded from the deterministic disk cache when a sibling process
    already trained them."""
    cached = _load_model_cache()
    if cached is not None:
        return cached
    tri_counts = np.zeros((N_BUCKETS, len(LANGS)), dtype=np.float64)
    lm_c3 = np.zeros(N_BUCKETS, dtype=np.float64)
    lm_c2ctx = np.zeros(N_BUCKETS, dtype=np.float64)
    lm_c2 = np.zeros(N_BUCKETS, dtype=np.float64)
    lm_c1ctx = np.zeros(N_BUCKETS, dtype=np.float64)
    lm_c1 = np.zeros(N_BUCKETS, dtype=np.float64)
    lm_total = 0.0

    for li, vocab in enumerate((EN_VOCAB, IT_VOCAB)):
        for sent in _train_sentences(vocab, _TRAIN_SEED + li):
            cs = _codes(sent)
            if len(cs) < 3:
                continue
            a, b, c = cs[:-2], cs[1:-1], cs[2:]
            h3 = _hash3(a, b, c)
            np.add.at(tri_counts[:, li], h3.astype(np.int64), 1.0)
            if li == 0:  # LM trained on the target language only
                np.add.at(lm_c3, h3.astype(np.int64), 1.0)
                np.add.at(lm_c2ctx, _hash2(a, b).astype(np.int64), 1.0)
                np.add.at(lm_c2, _hash2(b, c).astype(np.int64), 1.0)
                np.add.at(lm_c1ctx, (b % np.uint64(N_BUCKETS)).astype(np.int64), 1.0)
                np.add.at(lm_c1, (c % np.uint64(N_BUCKETS)).astype(np.int64), 1.0)
                lm_total += len(c)

    totals = tri_counts.sum(axis=0)
    logp = np.log(tri_counts + _ALPHA) - np.log(totals + _ALPHA * N_BUCKETS)
    models = {
        "langid_logp": logp.astype(np.float32),
        "lm": (lm_c3, lm_c2ctx, lm_c2, lm_c1ctx, lm_c1, lm_total),
    }
    _save_model_cache(models)
    return models


# --------------------------------------------------------------------------
# batch (vectorized) scoring — the Spark path
# --------------------------------------------------------------------------

def _batch_windows(texts: list[str]):
    """One utf-32 decode for the whole batch → trigram windows + doc ids.

    Returns (a, b, c, doc_id_per_window, n_docs); windows crossing a doc
    separator are dropped.
    """
    joined = "\x00".join(normalize(t) for t in texts)
    arr = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    n_docs = len(texts)
    if len(arr) < 3:
        e = np.empty(0, dtype=np.uint64)
        return e, e, e, np.empty(0, dtype=np.int64), n_docs
    sep = arr == _SEP
    doc_of_pos = np.cumsum(sep).astype(np.int64)  # doc index per position
    a, b, c = arr[:-2], arr[1:-1], arr[2:]
    valid = ~(sep[:-2] | sep[1:-1] | sep[2:])
    doc_id = doc_of_pos[:-2][valid]
    return a[valid], b[valid], c[valid], doc_id, n_docs


def langid_batch(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """→ (lang index array int64 with -1 for unscorable, confidence array)."""
    m = get_models()["langid_logp"]
    a, b, c, doc_id, n_docs = _batch_windows(texts)
    scores = np.zeros((n_docs, len(LANGS)), dtype=np.float64)
    counts = np.bincount(doc_id, minlength=n_docs).astype(np.float64)
    if len(a):
        h3 = _hash3(a, b, c).astype(np.int64)
        w = m[h3].astype(np.float64)  # (n_windows, n_langs)
        for li in range(len(LANGS)):
            scores[:, li] = np.bincount(doc_id, weights=w[:, li], minlength=n_docs)
    best = scores.argmax(axis=1)
    other = scores.min(axis=1) if len(LANGS) == 2 else None
    margin = scores.max(axis=1) - other
    conf = 1.0 / (1.0 + np.exp(-margin))
    best = np.where(counts > 0, best, -1)
    conf = np.where(counts > 0, conf, 0.0)
    return best.astype(np.int64), conf


def perplexity_batch(texts: list[str]) -> np.ndarray:
    """Char-trigram stupid-backoff perplexity per doc (NaN if <1 window)."""
    c3, c2ctx, c2, c1ctx, c1, total = get_models()["lm"]
    a, b, c, doc_id, n_docs = _batch_windows(texts)
    counts = np.bincount(doc_id, minlength=n_docs).astype(np.float64)
    if not len(a):
        return np.full(n_docs, np.nan)
    h3 = _hash3(a, b, c).astype(np.int64)
    h2ctx = _hash2(a, b).astype(np.int64)
    h2 = _hash2(b, c).astype(np.int64)
    hb = (b % np.uint64(N_BUCKETS)).astype(np.int64)
    hc = (c % np.uint64(N_BUCKETS)).astype(np.int64)

    p_uni = _BACKOFF * _BACKOFF * (c1[hc] + 1.0) / (total + _VOCAB_SIZE)
    with np.errstate(divide="ignore", invalid="ignore"):
        p_bi = np.where(
            (c2[h2] > 0) & (c1ctx[hb] > 0), _BACKOFF * c2[h2] / np.maximum(c1ctx[hb], 1.0), p_uni
        )
        p_tri = np.where(
            (c3[h3] > 0) & (c2ctx[h2ctx] > 0), c3[h3] / np.maximum(c2ctx[h2ctx], 1.0), p_bi
        )
    logp = np.log(p_tri)
    sums = np.bincount(doc_id, weights=logp, minlength=n_docs)
    with np.errstate(divide="ignore", invalid="ignore"):
        ppl = np.exp(-sums / counts)
    return np.where(counts > 0, ppl, np.nan)


# --------------------------------------------------------------------------
# scalar scoring — the oracle path (independent straightforward impl)
# --------------------------------------------------------------------------

def langid_one(text: str | None) -> tuple[str | None, float]:
    if text is None:
        return None, 0.0
    m = get_models()["langid_logp"]
    cs = [ord(ch) for ch in normalize(text)]
    if len(cs) < 3:
        return None, 0.0
    scores = [0.0] * len(LANGS)
    for i in range(len(cs) - 2):
        h = _hash3_s(cs[i], cs[i + 1], cs[i + 2])
        for li in range(len(LANGS)):
            scores[li] += float(m[h, li])
    best = max(range(len(LANGS)), key=lambda li: scores[li])
    margin = max(scores) - min(scores)
    conf = 1.0 / (1.0 + math.exp(-margin))
    return LANGS[best], conf


def perplexity_one(text: str | None) -> float:
    if text is None:
        return float("nan")
    c3, c2ctx, c2, c1ctx, c1, total = get_models()["lm"]
    cs = [ord(ch) for ch in normalize(text)]
    if len(cs) < 3:
        return float("nan")
    logsum = 0.0
    n = 0
    for i in range(len(cs) - 2):
        a, b, c_ = cs[i], cs[i + 1], cs[i + 2]
        h3 = _hash3_s(a, b, c_)
        h2ctx = _hash2_s(a, b)
        if c3[h3] > 0 and c2ctx[h2ctx] > 0:
            p = c3[h3] / c2ctx[h2ctx]
        else:
            h2 = _hash2_s(b, c_)
            hb = b % N_BUCKETS
            if c2[h2] > 0 and c1ctx[hb] > 0:
                p = _BACKOFF * c2[h2] / c1ctx[hb]
            else:
                p = _BACKOFF * _BACKOFF * (c1[c_ % N_BUCKETS] + 1.0) / (total + _VOCAB_SIZE)
        logsum += math.log(p)
        n += 1
    return math.exp(-logsum / n)
