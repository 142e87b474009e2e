"""Streaming SimHash near-dup — the ingest-side twin of
pipeline/dedup.simhash_pairs (r4 verdict "missing #4").

A training-data ingest wants NEAR-dup detection at arrival, not only
exact (streaming/dedup.py): a lightly-edited copy of a document that
flowed through an hour ago should be flagged before it lands in the
corpus. Same banded scheme as the batch op: any pair within Hamming
distance ≤ 3 of a 64-bit SimHash agrees exactly on ≥1 of four 16-bit
bands (pigeonhole), so each micro-batch's docs only meet the bounded
per-(band, bucket) state — never corpus history.

Scale shape (100 TB/day ingest): fingerprinting is one Arrow UDF pass
per micro-batch (the SAME pandas UDF as the batch op — parity by
construction); state is partitioned over 4 x 2^16 (band, bucket)
groups, each holding only fingerprints (24 bytes/doc) seen within
``ttl + watermark`` of that bucket's newest event, pruned every batch
(the match window itself is ``ttl``); candidate
verification is a vectorized numpy xor+popcount against just the
bucket's members. No shuffle beyond the groupBy(band, bucket) that any
stateful operator needs.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from ..pipeline.dedup import simhash_udf

_N_BANDS = 4
_BAND_BITS = 16
_BAND_MASK = (1 << _BAND_BITS) - 1


def stream_simhash_pairs(stream_df: DataFrame,
                         id_col: str = "doc_id",
                         text_col: str = "text",
                         ts_col: Optional[str] = None,
                         max_hamming: int = 3,
                         ttl: Optional[str] = "1 hour",
                         watermark: str = "1 hour") -> DataFrame:
    """Near-dup pairs on a stream: each arriving doc is checked against
    the fingerprints seen within ``ttl`` (event time, per bucket).

    Cross-band duplicate suppression costs no second stateful operator:
    a pair agreeing on several bands is emitted ONLY by its lowest
    matching band — both fingerprints are in hand at comparison time,
    so every band's group decides "is some earlier band also a match?"
    locally and deterministically (the distributed analog of the batch
    op's ``.distinct()``).

    With ``ts_col``: input gets ``withWatermark(ts_col, watermark)``,
    the MATCH window is ``ttl`` relative to each arriving doc's event
    time, and physical state retention is ``ttl + watermark`` behind
    each bucket's newest event. The extra ``watermark`` of retention is
    what keeps lowest-band suppression sound: buckets prune on their
    own local clocks (an unrelated newer doc advances one bucket but
    not another), so an entry must survive in EVERY band's bucket for
    as long as an in-watermark arrival could still pair with it —
    otherwise a pair could be pruned from its lowest matching band yet
    suppressed in a higher one. Without ``ts_col`` state grows with
    distinct fingerprints (tests/small streams only).

    ``id_col`` must be integral (the 24-byte/doc state packs ids as
    longs); re-delivered ids (at-least-once sources) are ignored after
    first sight — first-wins, matching stream_exact_dedup. Pairs with
    out-of-watermark stragglers follow watermark semantics: data later
    than the watermark has no delivery guarantee anywhere in Structured
    Streaming, and may likewise be missed here.

    Output (append mode): id_a, id_b (id_a < id_b), hamming — the
    batch ``simhash_pairs`` schema, so a stream over the same docs
    yields the same pair set (tested)."""
    import pandas as pd
    import numpy as np
    from pyspark.sql.streaming.state import GroupStateTimeout

    if max_hamming > _N_BANDS - 1:
        # pigeonhole recall guarantee: d <= bands-1 collides on >= 1
        # band; a larger threshold would SILENTLY miss pairs whose
        # bits spread one-per-band
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the {_N_BANDS}-band "
            f"recall guarantee (<= {_N_BANDS - 1}); raise the band "
            "count, not the threshold")
    id_type = dict(stream_df.dtypes).get(id_col)
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"{id_col!r} must be an integral column for the packed "
            f"fingerprint state (got {id_type}); hash or dictionary-"
            "encode string ids upstream")

    from ._util import dur_us as _dur_us

    ttl_us = None
    retain_us = None
    if ts_col is not None and ttl is not None:
        ttl_us = _dur_us(ttl)
        retain_us = ttl_us + _dur_us(watermark)

    src = stream_df
    if ts_col is not None:
        src = src.withWatermark(ts_col, watermark)

    bands = F.array(*[
        F.shiftrightunsigned(F.col("simhash"), _BAND_BITS * b)
         .bitwiseAND(F.lit(_BAND_MASK))
        for b in range(_N_BANDS)
    ])
    cols = [F.col(id_col).alias("__id"),
            simhash_udf()(F.col(text_col)).alias("simhash")]
    if ts_col is not None:
        cols.append((F.col(ts_col).cast("double") * 1_000_000)
                    .cast("long").alias("__ts_us"))
    else:
        cols.append(F.lit(0).cast("long").alias("__ts_us"))
    fb = (src.select(*cols)
          .filter(F.col("simhash").isNotNull())
          .select("__id", "simhash", "__ts_us",
                  F.posexplode(bands).alias("__band", "__bucket")))

    out_schema = "id_a long, id_b long, hamming int"
    state_schema = "ids array<long>, fps array<long>, tss array<long>"

    def _band_vals(fp_u64: np.ndarray, k: int) -> np.ndarray:
        return (fp_u64 >> np.uint64(_BAND_BITS * k)) \
            & np.uint64(_BAND_MASK)

    def fn(key, pdfs, state):
        band = int(key[0])
        if state.exists:
            s_ids, s_fps, s_tss = state.get
            ids = list(s_ids)
            fps = list(s_fps)
            tss = list(s_tss)
        else:
            ids, fps, tss = [], [], []

        frames = [p for p in pdfs if len(p)]
        out_a, out_b, out_h = [], [], []
        if frames:
            pdf = (pd.concat(frames, ignore_index=True)
                   if len(frames) > 1 else frames[0])
            # deterministic arrival order within the batch
            pdf = pdf.sort_values(["__ts_us", "__id"], kind="stable")
            known = set(ids)
            for did, fp, ts_us in zip(pdf["__id"], pdf["simhash"],
                                      pdf["__ts_us"]):
                did, fp, ts_us = int(did), int(fp), int(ts_us)
                if did in known:
                    # at-least-once re-delivery: first sight wins (a
                    # second state entry would double-emit every later
                    # pair involving this id)
                    continue
                if fps:
                    prev = np.array(fps, dtype=np.int64) \
                        .view(np.uint64)
                    cur = np.uint64(fp & (2**64 - 1))
                    x = prev ^ cur
                    ham = np.unpackbits(
                        x.view(np.uint8)).reshape(-1, 8 * 8).sum(axis=1)
                    ok = ham <= max_hamming
                    if ttl_us is not None:
                        # an entry older than ttl RELATIVE TO THIS DOC
                        # must not match, even if the batch-end prune
                        # hasn't dropped it yet
                        ok &= (np.array(tss, dtype=np.int64)
                               >= ts_us - ttl_us)
                    hit = np.nonzero(ok)[0]
                    if len(hit):
                        # lowest-matching-band suppression: emit only
                        # if no band < this one also matches (sound
                        # because retention = ttl + watermark keeps the
                        # partner alive in EVERY matching band for any
                        # in-watermark arrival — see docstring)
                        for i in hit:
                            pfp = np.uint64(fps[i] & (2**64 - 1))
                            first = next(
                                k for k in range(_N_BANDS)
                                if _band_vals(np.array([pfp]), k)[0]
                                == _band_vals(np.array([cur]), k)[0])
                            if first != band:
                                continue
                            a, b = sorted((ids[i], did))
                            out_a.append(a)
                            out_b.append(b)
                            out_h.append(int(ham[i]))
                ids.append(did)
                fps.append(fp)
                tss.append(ts_us)
                known.add(did)
            if retain_us is not None and tss:
                # physical retention = ttl + watermark behind THIS
                # bucket's local clock (match window stays ttl via the
                # per-row mask above): retention must outlast any
                # in-watermark arrival that could still pair with an
                # entry, or bucket-local pruning would break the
                # lowest-band suppression invariant
                cutoff = max(tss) - retain_us
                keep = [i for i, t in enumerate(tss) if t >= cutoff]
                ids = [ids[i] for i in keep]
                fps = [fps[i] for i in keep]
                tss = [tss[i] for i in keep]
        state.update((ids, fps, tss))
        yield pd.DataFrame({"id_a": out_a, "id_b": out_b,
                            "hamming": out_h})

    return (fb.groupBy("__band", "__bucket")
            .applyInPandasWithState(
                fn, out_schema, state_schema, "append",
                GroupStateTimeout.NoTimeout))
