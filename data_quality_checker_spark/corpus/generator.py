"""Deterministic synthetic clips corpus.

Emits the Iceberg-shaped clips table (FIXTURES.md §1) with injected defect
classes mirroring the reference's fixture design
(/root/reference/tests/conftest.py:50-70 — every issue type represented,
plus a clean majority like its clean_dataframe): nulls, exact-duplicate
bytes (including one hot key for skew), out-of-range and outlier dur_ms,
off-whitelist sr_hz / codec, empty and too-short transcripts,
wrong-language and gibberish transcripts, PII emails/phones (keep+scrub),
clipped PCM, and dur_ms/decoded-length mismatches.

Fully seeded — no wall clock, no global RNG. SF scaling: ``CLIPS_PER_SF``
clips per unit of sf (sf=0.1 → 2_000 clips).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import DEFAULT_CONFIG, PipelineConfig
from .audio import encode_flac_stub, encode_pcm_s16le, encode_wav
from .vocab import DOMAINS, EN_VOCAB, FIRST_NAMES, IT_VOCAB

CLIPS_PER_SF = 20_000
SEED = 42
# Bump whenever generated CONTENT changes (defect mix, vocab, encoding):
# cache paths embed it, so stale /tmp fixtures from an older generator can
# never poison a correctness run. v1 == the round-1 corpus (unchanged).
FIXTURE_VERSION = 1

# defect class → probability (clean = remainder). One entry per reference
# fixture defect (FIXTURES.md table).
DEFECT_PROBS: dict[str, float] = {
    "null_transcript": 0.010,
    "null_sr": 0.005,
    "null_dur": 0.005,
    "null_bytes": 0.005,
    "dup": 0.030,
    "dup_hot": 0.005,          # many copies of ONE clip → skewed dedup key
    "dur_below_min": 0.006,
    "dur_above_max": 0.006,
    "dur_outlier": 0.006,      # in-range but far outside the IQR fence
    "bad_sr": 0.010,
    "bad_codec": 0.006,
    "empty_transcript": 0.010,
    "short_transcript": 0.010,
    "wrong_lang": 0.020,
    "gibberish": 0.012,
    "pii_email": 0.015,
    "pii_phone": 0.015,
    "toxicity": 0.006,
    "clipped_audio": 0.010,
    "dur_mismatch": 0.006,
}

GIBBERISH_ALPHABET = np.array(list("abcdefghijklmnopqrstuvwxyz    "))


def _sentence(rng: np.random.Generator, vocab, n_min=6, n_max=18) -> str:
    n = int(rng.integers(n_min, n_max + 1))
    return " ".join(rng.choice(np.asarray(vocab), size=n))


def _synth_samples(rng: np.random.Generator, n: int, clipped: bool) -> np.ndarray:
    t = np.arange(n, dtype=np.float64)
    freq = float(rng.uniform(0.01, 0.12))  # radians/sample
    amp = 2.5 if clipped else float(rng.uniform(0.3, 0.7))
    sig = amp * np.sin(freq * t) + rng.normal(0.0, 0.01, size=n)
    return np.clip(sig, -1.0, 1.0)


def generate_clips(
    sf: float,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    seed: int = SEED,
) -> pd.DataFrame:
    """Return the clips table as pandas (columns per CLIPS_SCHEMA plus a
    ``defect`` debug column the pipeline never sees)."""
    n = max(int(round(sf * CLIPS_PER_SF)), 20)
    rng = np.random.default_rng(seed)

    classes = list(DEFECT_PROBS)
    probs = np.array([DEFECT_PROBS[c] for c in classes])
    p_clean = 1.0 - probs.sum()
    assert p_clean > 0.5
    draw = rng.choice(len(classes) + 1, size=n, p=list(probs) + [p_clean])
    defects = [classes[d] if d < len(classes) else "clean" for d in draw]
    # the corpus must always contain the hot duplicate source
    hot_source_idx = 0
    defects[hot_source_idx] = "clean"

    rows: list[dict] = []
    dup_pool: list[int] = []  # indices of already-emitted clean rows
    for i in range(n):
        d = defects[i]
        clip_id = f"clip_{i:012d}"
        sr = int(rng.choice(cfg.sr_hz_whitelist, p=[0.55, 0.3, 0.05, 0.05, 0.05]))
        codec = str(rng.choice(["wav", "pcm_s16le", "flac"], p=[0.6, 0.25, 0.15]))
        dur_ms = int(rng.integers(cfg.dur_ms_min, 3000))
        transcript: str | None = _sentence(rng, EN_VOCAB)
        clipped = False
        actual_dur_ms = None  # None → matches dur_ms

        if d == "dup" and dup_pool:
            src = rows[int(rng.choice(dup_pool))]
            rows.append({**src, "clip_id": clip_id, "defect": "dup"})
            continue
        if d == "dup_hot":
            src = rows[hot_source_idx] if rows else None
            if src is not None:
                rows.append({**src, "clip_id": clip_id, "defect": "dup_hot"})
                continue
            d = "clean"

        if d == "null_transcript":
            transcript = None
        elif d == "null_sr":
            sr = None  # type: ignore[assignment]
        elif d == "null_dur":
            dur_ms = None  # type: ignore[assignment]
        elif d == "dur_below_min":
            dur_ms = int(rng.integers(10, cfg.dur_ms_min))
        elif d == "dur_above_max":
            dur_ms = int(rng.integers(cfg.dur_ms_max + 1, cfg.dur_ms_max + 8000))
        elif d == "dur_outlier":
            # inside [min,max] but far outside the Q3 + 1.5*IQR fence of the
            # 400..3000 bulk (validator.py:279-281 analog)
            dur_ms = int(rng.integers(20_000, cfg.dur_ms_max))
        elif d == "bad_sr":
            sr = int(rng.choice([11025, 12345, 3000, 96000]))
        elif d == "bad_codec":
            codec = str(rng.choice(["xyz", "", "mp9"]))
        elif d == "empty_transcript":
            transcript = ""
        elif d == "short_transcript":
            transcript = str(rng.choice(["ok", "hm", "a", "yes", "no w"]))
        elif d == "wrong_lang":
            transcript = _sentence(rng, IT_VOCAB)
        elif d == "gibberish":
            transcript = "".join(rng.choice(GIBBERISH_ALPHABET, size=int(rng.integers(40, 120))))
        elif d == "pii_email":
            name = str(rng.choice(FIRST_NAMES))
            dom = str(rng.choice(DOMAINS))
            transcript = f"{_sentence(rng, EN_VOCAB, 4, 9)} contact {name}.{name}@{dom} please"
        elif d == "pii_phone":
            digits = rng.integers(0, 10, size=10)
            ph = f"{digits[0]}{digits[1]}{digits[2]}-{digits[3]}{digits[4]}{digits[5]}-{''.join(map(str, digits[6:]))}"
            transcript = f"{_sentence(rng, EN_VOCAB, 4, 9)} call {ph} now"
        elif d == "toxicity":
            tox = str(rng.choice(["frak", "gorram", "smeghead"]))
            transcript = f"{_sentence(rng, EN_VOCAB, 3, 7)} {tox} {_sentence(rng, EN_VOCAB, 3, 7)}"
        elif d == "clipped_audio":
            clipped = True
        elif d == "dur_mismatch":
            actual_dur_ms = dur_ms + int(rng.choice([-1, 1]) * rng.integers(300, 900))
            actual_dur_ms = max(actual_dur_ms, 100)

        payload = None
        if d != "null_bytes":
            sr_eff = sr if sr else 8000
            n_samp = max(int(((actual_dur_ms if actual_dur_ms else dur_ms) or 1000) * sr_eff / 1000), 8)
            samples = _synth_samples(rng, n_samp, clipped)
            if codec == "wav":
                payload = encode_wav(samples, sr_eff)
            elif codec == "pcm_s16le":
                payload = encode_pcm_s16le(samples)
            elif codec == "flac":
                payload = encode_flac_stub(samples, sr_eff)
            else:  # invalid codec: still emit decodable-as-wav bytes
                payload = encode_wav(samples, sr_eff)

        rows.append(
            {
                "clip_id": clip_id,
                "bytes": payload,
                "sr_hz": sr,
                "dur_ms": dur_ms,
                "codec": codec,
                "transcript": transcript,
                "defect": d,
            }
        )
        if d == "clean":
            dup_pool.append(i)

    df = pd.DataFrame(rows)
    df["sr_hz"] = df["sr_hz"].astype("Int32")
    df["dur_ms"] = df["dur_ms"].astype("Int32")
    return df


def write_clips_parquet(path: str, sf: float, cfg: PipelineConfig = DEFAULT_CONFIG,
                        seed: int = SEED) -> pd.DataFrame:
    """Write the corpus (without the debug ``defect`` column) to parquet."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = generate_clips(sf, cfg, seed)
    table = pa.Table.from_pandas(df.drop(columns=["defect"]), preserve_index=False)
    schema = pa.schema(
        [
            pa.field("clip_id", pa.string(), nullable=False),
            pa.field("bytes", pa.binary()),
            pa.field("sr_hz", pa.int32()),
            pa.field("dur_ms", pa.int32()),
            pa.field("codec", pa.string()),
            pa.field("transcript", pa.string()),
        ]
    )
    # tmp+rename: a concurrent generator (driver smoke-check racing the
    # bench) must never observe a half-written file; os.replace is atomic
    # and the loser's rename simply overwrites with identical bytes
    # (deterministic corpus).
    import os

    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table.cast(schema), tmp, row_group_size=_payload_row_group_rows(table))
    os.replace(tmp, path)
    return df


def _payload_row_group_rows(table, target_bytes: int = 96 * 2**20) -> int:
    """Rows per parquet row group for a binary-payload table, sized so a
    group holds ~``target_bytes``. pyarrow's default row-group bound is
    ROW-count-based (1Mi rows), so a payload table under 1M rows lands in
    ONE row group — at sf10 that is a single 12 GB group, and parquet
    readers parallelize across row groups: one Spark task then scans the
    whole file (and buffers its column-chunk pages — measured Java-heap
    OOM at an 8g heap). ~96 MB groups match the scan split size, so a
    128 MB split owns ~1 group and the scan parallelizes fully — the
    same row-group discipline any 100 TB ingest writer must apply."""
    n = table.num_rows
    if n == 0:
        return 1
    avg = max(table.nbytes // n, 1)
    return max(64, min(n, int(target_bytes // avg)))
