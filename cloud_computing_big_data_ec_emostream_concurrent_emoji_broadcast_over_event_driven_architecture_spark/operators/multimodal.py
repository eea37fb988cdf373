"""Multimodal column convention (SURVEY.md §7 Phase 5): media as opaque
``binary`` payloads + a typed metadata struct, with decode / feature
extraction as Arrow-batched ``mapInPandas`` stages.

The container has no image/audio libraries, so the decode step is a
clearly-marked deterministic stub (``_fake_decode``) — the Spark-side
plumbing (schema, batch iteration, partition-preserving flow, typed
feature output) is real and is what the tests exercise. Swapping the stub
for PIL/ffmpeg changes one function, not the plan.

``documents.text`` stands in for the raw bytes (``encode(text, 'utf-8')``);
a real pipeline reads parquet/blob-store binary columns identically.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..plans.registry import register

MODALITY = "text-bytes"

# head_hex is a scalar hex fingerprint of the first 8 bytes — the contract
# surface stays hashable/sortable for differential checks (an array<int>
# column here broke the driver's canonicalizer in round 1)
FEATURE_SCHEMA = (
    "doc_id long, modality string, n_bytes int, "
    "checksum long, head_hex string"
)


def binary_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, payload binary, meta struct<modality,n_bytes>)
    — the engine's multimodal column convention."""
    docs = table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit(MODALITY).alias("modality"),
            F.octet_length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> dict:
    """STUB decoder — deterministic stand-in for an image/audio decode.
    Replace with the real library call (PIL.Image.open etc.) when the
    dependency exists; everything around it is production plumbing."""
    checksum = 0
    for b in payload:
        checksum = (checksum * 131 + b) % (1 << 61)
    return {
        "n_bytes": len(payload),
        "checksum": checksum,
        "head_hex": payload[:8].hex(),
    }


def _extract_features(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow batches in, typed feature rows out."""
    for pdf in batches:
        feats = pdf["payload"].map(_fake_decode)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "modality": [m["modality"] for m in pdf["meta"]],
                "n_bytes": [f["n_bytes"] for f in feats],
                "checksum": [f["checksum"] for f in feats],
                "head_hex": [f["head_hex"] for f in feats],
            }
        )


@register(
    "q_multimodal_meta",
    tags=("multimodal",),
    oracle=f"""
        SELECT doc_id, '{MODALITY}' AS modality,
               octet_length(encode(text)) AS n_bytes
        FROM documents
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over binary payloads — JVM-side only (no decode), so
    metadata scans never touch the heavy bytes at scale (column pruning
    drops ``payload`` entirely)."""
    bf = binary_frame(spark, sf_dir)
    return bf.select(
        "doc_id", F.col("meta.modality").alias("modality"),
        F.col("meta.n_bytes").alias("n_bytes"),
    )


@register(
    "q_multimodal_features",
    tags=("multimodal", "pandas-udf"),
    oracle=None,  # decode stub is Python-side — driver's rows-only check;
    # exactness is pinned by tests/test_multimodal.py instead
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via Arrow-batched
    mapInPandas — the pattern for decode/resize/frame-sample stages. The
    stub keeps outputs deterministic (byte length, rolling checksum, head
    bytes) so tests can assert exact values."""
    return binary_frame(spark, sf_dir).mapInPandas(
        _extract_features, schema=FEATURE_SCHEMA
    )


FRAME_BYTES = 256
FRAME_STRIDE = 2  # keep every 2nd frame


@register(
    "q_multimodal_frames",
    tags=("multimodal", "frames"),
    oracle=f"""
        WITH f AS (
            SELECT doc_id, n_chars,
                   unnest(range(0, CAST(ceil(n_chars * 1.0 / {FRAME_BYTES})
                                        AS BIGINT))) AS frame_idx
            FROM documents
        )
        SELECT d.doc_id, f.frame_idx,
               md5(substr(d.text, CAST(f.frame_idx * {FRAME_BYTES} + 1 AS INT),
                          {FRAME_BYTES})) AS frame_md5
        FROM f JOIN documents d ON f.doc_id = d.doc_id
        WHERE f.frame_idx % {FRAME_STRIDE} = 0
    """,
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads: split each payload into
    256-byte frames, keep every 2nd, fingerprint each frame — the video
    frame-sample pattern with the decode stubbed by byte slicing (the
    documents text is ASCII, so the DuckDB oracle's char slices are the
    same bytes). One-to-many expansion is sequence+explode — pure
    codegen, no Python; per-frame work partitions with the frame, so a
    1-hour video and a 10-second clip cost proportionally. Swap the
    byte-slice for a real codec via mapInPandas (see _extract_features)
    when the library exists."""
    frames = (
        binary_frame(spark, sf_dir)
        # empty payloads yield no frames (F.sequence(0, -1) would step
        # DOWNWARD and emit spurious indices — Spark sequences are
        # bidirectional)
        .filter(F.col("meta.n_bytes") > 0)
        .select(
            "doc_id",
            "payload",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.col("meta.n_bytes") / F.lit(FRAME_BYTES)).cast(
                        "long"
                    )
                    - 1,
                )
            ).alias("frame_idx"),
        )
        .filter(F.col("frame_idx") % FRAME_STRIDE == 0)
    )
    frame = F.substring(
        F.col("payload"), F.col("frame_idx") * FRAME_BYTES + 1, FRAME_BYTES
    )
    return frames.select(
        "doc_id", "frame_idx", F.md5(frame).alias("frame_md5")
    )


RESIZE_BYTES = 128


@register(
    "q_multimodal_resize",
    tags=("multimodal", "resize"),
    oracle=f"""
        SELECT doc_id,
               md5(CASE WHEN n_chars >= {RESIZE_BYTES}
                        THEN substr(text, 1, {RESIZE_BYTES})
                        ELSE text || repeat(chr(32),
                                            {RESIZE_BYTES} - n_chars) END)
                   AS resized_md5,
               {RESIZE_BYTES} AS n_bytes
        FROM documents
    """,
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize-to-fixed-shape over binary payloads: truncate or pad every
    payload to exactly 128 bytes and fingerprint the result — the
    image-resize pattern with the codec stubbed by byte slicing (ASCII
    text ⇒ the oracle's char ops are the same bytes; space is the
    deterministic pad). Pure per-row projection: at 100 TB this is
    embarrassingly parallel and never shuffles."""
    bf = binary_frame(spark, sf_dir)
    resized = F.rpad(
        F.substring(F.col("payload").cast("string"), 1, RESIZE_BYTES),
        RESIZE_BYTES,
        " ",
    )
    return bf.select(
        "doc_id",
        F.md5(F.encode(resized, "utf-8")).alias("resized_md5"),
        F.lit(RESIZE_BYTES).alias("n_bytes"),
    )


# --- block-hash (pHash-style) near-duplicate detection ----------------------
PH_BLOCKS = 16  # fixed-offset blocks -> 4 bits each = 64-bit hash
PH_BLOCK_BYTES = 32  # hash covers the first 512 payload bytes
PH_BANDS = 4  # 4 bands x 16 bits for the LSH-style candidate join
PH_BAND_BYTES = PH_BLOCK_BYTES * (PH_BLOCKS // PH_BANDS)  # 128
PH_HAM_MAX = 8  # max Hamming distance (of 64) to call a near-dup


def _ph_hex_expr(dialect: str) -> str:
    """16-hex-char block hash: first md5 hex char of each FIXED-OFFSET
    {PH_BLOCK_BYTES}-byte payload block. Fixed offsets (not scaled) are
    the byte-stream analog of pHash's spatial grid: a local edit
    perturbs only the blocks it touches, so near-identical payloads
    stay within Hamming budget; past-the-end blocks digest the empty
    string identically in both engines."""
    col = "payload" if dialect == "spark" else "text"
    sub = "substring" if dialect == "spark" else "substr"
    parts = [
        f"{sub}(md5({sub}({col}, {i * PH_BLOCK_BYTES + 1},"
        f" {PH_BLOCK_BYTES})), 1, 1)"
        for i in range(PH_BLOCKS)
    ]
    return "concat(" + ", ".join(parts) + ")"


def _ph_band_sql(dialect: str, j: int) -> str:
    """Band j (16 bits) of the hex hash as a BIGINT."""
    piece = f"substr(ph, {j * 4 + 1}, 4)"
    if dialect == "spark":
        return f"conv({piece}, 16, 10)"
    return f"CAST('0x' || {piece} AS BIGINT)"


@register(
    "q_multimodal_phash",
    headline=True,
    tags=("multimodal", "dedup", "lsh", "scale"),
    oracle=f"""
        WITH h AS (
            SELECT doc_id, n_chars, {_ph_hex_expr('duck')} AS ph
            FROM documents
        ),
        b AS (
            SELECT doc_id, n_chars,
                   {", ".join(_ph_band_sql('duck', j) + f' AS b{j}'
                              for j in range(PH_BANDS))}
            FROM h
        ),
        expl AS (
            SELECT doc_id, b0, b1, b2, b3, band_idx,
                   CASE band_idx WHEN 0 THEN b0 WHEN 1 THEN b1
                                 WHEN 2 THEN b2 ELSE b3 END AS band_val
            FROM b, (SELECT unnest(range(0, {PH_BANDS})) AS band_idx)
            WHERE band_idx * {PH_BAND_BYTES} < n_chars
        ),
        cand AS (
            SELECT DISTINCT
                   a.doc_id AS doc_a, c.doc_id AS doc_b,
                   (bit_count(xor(a.b0, c.b0)) + bit_count(xor(a.b1, c.b1))
                    + bit_count(xor(a.b2, c.b2)) + bit_count(xor(a.b3, c.b3)))
                       AS hamming
            FROM expl a JOIN expl c
              ON a.band_idx = c.band_idx AND a.band_val = c.band_val
             AND a.doc_id < c.doc_id
        )
        SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
        FROM cand WHERE hamming <= {PH_HAM_MAX}
    """,
)
def q_multimodal_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCEPTUAL-HASH near-duplicate detection over BINARY payloads —
    the image-dedup pattern (blockhash/pHash): each payload is divided
    into {PH_BLOCKS} fixed-offset {PH_BLOCK_BYTES}-byte blocks, each
    block digests to 4 bits, and the 64-bit hash is banded
    {PH_BANDS}×16 for an LSH-style candidate equi-join; candidates
    verify on full 64-bit Hamming distance ≤ {PH_HAM_MAX}. Fixed
    offsets are the byte-stream analog of pHash's spatial grid: a
    local edit flips only the touched blocks' bits, so near-identical
    payloads stay within budget while the band join keeps candidate
    generation far from all-pairs.

    The block digest is the deterministic md5 stand-in for a real
    DCT/mean threshold (no image libs in env — see ``_fake_decode``);
    band join, Hamming verify, and all plumbing are the production
    shape, and the ASCII-text payload makes the DuckDB oracle replay
    the hash bit-for-bit.

    Skew guard: bands lying entirely past the payload's end would hash
    every short document to one all-empty-block value — a corpus-sized
    hot bucket — so band emission requires the band to cover at least
    one real byte (both engines apply the same predicate).

    Precision caveat (measured, tests/test_round4_ops.py): with 4-bit
    block digests, pairs of SHORT payloads (< ~2 bands of content)
    share many empty tail blocks and differing blocks only cost ~2
    noise bits, so some random short pairs land inside the Hamming
    budget. ``q_multimodal_phash_wide`` (16-bit digests) removes the
    regime entirely and is the production form for mixed-length
    corpora.

    Plan: hash = per-row projection (scan-bound); candidates = equi-join
    on (band_idx, 16-bit band value); verify reuses the carried band
    values (no join back to the corpus).

    ROUND-10 OPTIMIZATION (guide §7.2 duplicated-subtree audit): the
    original carried b0..b3 as plain projected columns, and the
    null-intolerant downstream predicates (join keys, ``hamming <=``)
    made Catalyst infer ``isnotnull(b_j)`` filters and push them below
    the explode — where each b_j re-derives the FULL 16-md5 block hash,
    so the scan-side Filter evaluated ~64 md5() + re-encoded the payload
    per row per side (see plans/r10/q_multimodal_phash_before.txt,
    Filter (2)). The band values now ride INSIDE the exploded struct:
    generator output is a pushdown barrier, so the inferred filters
    stay above the Generate and reference the already-computed struct
    fields. ``ph`` itself is computed once per row in its own projection
    (CollapseProject keeps multi-referenced non-cheap aliases
    un-inlined). Identical rows: same bands, same coverage predicate,
    same Hamming arithmetic."""
    bf = binary_frame(spark, sf_dir).select(
        "doc_id", "payload", F.col("meta.n_bytes").alias("n_bytes")
    )
    h = bf.select(
        "doc_id", "n_bytes", F.expr(_ph_hex_expr("spark")).alias("ph")
    )
    bvals = [
        F.expr(_ph_band_sql("spark", j)).cast("long")
        for j in range(PH_BANDS)
    ]
    band_structs = F.array(
        *[
            F.struct(
                F.lit(j).alias("band_idx"),
                bvals[j].alias("band_val"),
                *[bvals[k].alias(f"b{k}") for k in range(PH_BANDS)],
            )
            for j in range(PH_BANDS)
        ]
    )
    covered = F.filter(
        band_structs,
        lambda s: s["band_idx"] * PH_BAND_BYTES < F.col("n_bytes"),
    )
    expl = h.select("doc_id", F.explode(covered).alias("bk"))
    a = expl.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"bk.b{j}").alias(f"a{j}") for j in range(PH_BANDS)],
        F.col("bk.band_idx").alias("band_idx"),
        F.col("bk.band_val").alias("band_val"),
    )
    c = expl.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"bk.b{j}").alias(f"c{j}") for j in range(PH_BANDS)],
        F.col("bk.band_idx").alias("band_idx"),
        F.col("bk.band_val").alias("band_val"),
    )
    hamming = sum(
        F.bit_count(F.col(f"a{j}").bitwiseXOR(F.col(f"c{j}")))
        for j in range(PH_BANDS)
    )
    cand = (
        a.join(c, ["band_idx", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.cast("long").alias("hamming"))
        .distinct()
    )
    return cand.filter(F.col("hamming") <= PH_HAM_MAX)


# --- wide-band variant: the collision dial for big corpora ------------------
PHW_HEX_PER_BLOCK = 4  # 16 bits per block -> 256-bit hash
PHW_HAM_MAX = 32  # same fraction of the hash as PH_HAM_MAX is of 64


def _phw_hex_expr(dialect: str) -> str:
    """64-hex-char wide hash: {PHW_HEX_PER_BLOCK} md5 hex chars per
    fixed-offset block (16 bits/block vs the base operator's 4)."""
    col = "payload" if dialect == "spark" else "text"
    sub = "substring" if dialect == "spark" else "substr"
    parts = [
        f"{sub}(md5({sub}({col}, {i * PH_BLOCK_BYTES + 1},"
        f" {PH_BLOCK_BYTES})), 1, {PHW_HEX_PER_BLOCK})"
        for i in range(PH_BLOCKS)
    ]
    return "concat(" + ", ".join(parts) + ")"


def _phw_band_sql(dialect: str, j: int) -> str:
    """Band j (64 bits = 16 hex chars) of the wide hash as a BIGINT."""
    piece = f"substr(ph, {j * 16 + 1}, 16)"
    if dialect == "spark":
        # conv() of 16 hex chars can exceed int64 as unsigned — cast via
        # the same 15-char + 1-char split both engines can replay... keep
        # it simple: band key = the hex STRING (equi-join key needs no
        # arithmetic); Hamming still works per 8-hex sub-word
        return piece
    return piece


def _phw_word_sql(dialect: str, j: int, w: int) -> str:
    """Word w (32 bits = 8 hex chars) of band j as a BIGINT, for the
    bit_count(xor) Hamming fold (32-bit words stay well inside int64)."""
    piece = f"substr(ph, {j * 16 + w * 8 + 1}, 8)"
    if dialect == "spark":
        return f"cast(conv({piece}, 16, 10) as bigint)"
    return f"CAST('0x' || {piece} AS BIGINT)"


@register(
    "q_multimodal_phash_wide",
    tags=("multimodal", "dedup", "lsh", "scale"),
    oracle=f"""
        WITH h AS (
            SELECT doc_id, n_chars, {_phw_hex_expr('duck')} AS ph
            FROM documents
        ),
        b AS (
            SELECT doc_id, n_chars,
                   {", ".join(_phw_band_sql('duck', j) + f' AS bk{j}'
                              for j in range(PH_BANDS))},
                   {", ".join(_phw_word_sql('duck', j, w) + f' AS w{j}_{w}'
                              for j in range(PH_BANDS) for w in range(2))}
            FROM h
        ),
        expl AS (
            SELECT doc_id,
                   {", ".join(f"w{j}_{w}" for j in range(PH_BANDS)
                              for w in range(2))},
                   band_idx,
                   CASE band_idx WHEN 0 THEN bk0 WHEN 1 THEN bk1
                                 WHEN 2 THEN bk2 ELSE bk3 END AS band_val
            FROM b, (SELECT unnest(range(0, {PH_BANDS})) AS band_idx)
            WHERE band_idx * {PH_BAND_BYTES} < n_chars
        ),
        cand AS (
            SELECT DISTINCT
                   a.doc_id AS doc_a, c.doc_id AS doc_b,
                   ({" + ".join(
                       f"bit_count(xor(a.w{j}_{w}, c.w{j}_{w}))"
                       for j in range(PH_BANDS) for w in range(2)
                   )}) AS hamming
            FROM expl a JOIN expl c
              ON a.band_idx = c.band_idx AND a.band_val = c.band_val
             AND a.doc_id < c.doc_id
        )
        SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
        FROM cand WHERE hamming <= {PHW_HAM_MAX}
    """,
)
def q_multimodal_phash_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WIDE-BAND perceptual-hash near-dup — the production collision
    dial for the base ``q_multimodal_phash``: same {PH_BLOCKS}
    fixed-offset blocks, but each block digests to 16 bits (256-bit
    hash) and each LSH band is 64 bits, so random band collisions are
    ~N²/2^64 — vanishing at ANY corpus size, where the 16-bit bands of
    the base form start to pair random docs beyond ~10⁵ docs (measured:
    SCALING.md round 4). True near-dups still collide on every band
    their edits don't touch; the Hamming budget scales with the hash
    ({PHW_HAM_MAX}/256 = the base form's {PH_HAM_MAX}/64).

    Plan shape is identical: per-row hash projection, band equi-join
    (band key = the 16-hex string; Hamming folds over 32-bit words so
    the xor arithmetic stays in int64 in both engines), carried-value
    verify, empty-tail-band guard.

    ROUND-10 OPTIMIZATION: same band-in-struct restructuring as the
    base operator (see q_multimodal_phash) — the plain-column form let
    inferred isnotnull filters push below the explode and re-derive the
    full 16-md5 wide hash per filter term (the round-10 plan audit
    counted 256 md5() evaluations inside one scan Filter). Band keys
    and Hamming words now ride inside the generated struct; identical
    rows by construction."""
    bf = binary_frame(spark, sf_dir).select(
        "doc_id", "payload", F.col("meta.n_bytes").alias("n_bytes")
    )
    h = bf.select(
        "doc_id", "n_bytes", F.expr(_phw_hex_expr("spark")).alias("ph")
    )
    word_fields = [
        F.expr(_phw_word_sql("spark", j, w)).alias(f"w{j}_{w}")
        for j in range(PH_BANDS)
        for w in range(2)
    ]
    band_structs = F.array(
        *[
            F.struct(
                F.lit(j).alias("band_idx"),
                F.expr(_phw_band_sql("spark", j)).alias("band_val"),
                *word_fields,
            )
            for j in range(PH_BANDS)
        ]
    )
    covered = F.filter(
        band_structs,
        lambda s: s["band_idx"] * PH_BAND_BYTES < F.col("n_bytes"),
    )
    expl = h.select("doc_id", F.explode(covered).alias("bk"))
    a = expl.select(
        F.col("doc_id").alias("doc_a"),
        *[
            F.col(f"bk.w{j}_{w}").alias(f"a{j}_{w}")
            for j in range(PH_BANDS)
            for w in range(2)
        ],
        F.col("bk.band_idx").alias("band_idx"),
        F.col("bk.band_val").alias("band_val"),
    )
    c = expl.select(
        F.col("doc_id").alias("doc_b"),
        *[
            F.col(f"bk.w{j}_{w}").alias(f"c{j}_{w}")
            for j in range(PH_BANDS)
            for w in range(2)
        ],
        F.col("bk.band_idx").alias("band_idx"),
        F.col("bk.band_val").alias("band_val"),
    )
    hamming = sum(
        F.bit_count(F.col(f"a{j}_{w}").bitwiseXOR(F.col(f"c{j}_{w}")))
        for j in range(PH_BANDS)
        for w in range(2)
    )
    cand = (
        a.join(c, ["band_idx", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.cast("long").alias("hamming"))
        .distinct()
    )
    return cand.filter(F.col("hamming") <= PHW_HAM_MAX)
