"""DuckDB oracle SQL generators for the sketch operators.

Round 1 registered MinHash-LSH / OPH / SimHash / winnowing as rows-only
checks because their base hash (xxhash64) has no DuckDB twin. These
generators close that gap: the registry variants of the sketches run on
``portable_hash64`` (md5-prefix, bit-identical in DuckDB), so the WHOLE
pipeline — shingling, k affine permutations, OPH binning + rotation
densification, band-slice candidate generation, simhash bit-folding,
hamming verify — is replicated here in independent SQL and value-checked
end-to-end. No recall assumption anywhere: the oracle computes the same
algorithm, not a brute-force stand-in.

Each generator takes the SAME parameters as the Spark operator and emits
the parameter values as literals, so a drift between the two
implementations (different permutation constants, band split, probe cap)
shows up as a value mismatch, not silence.
"""

from __future__ import annotations

from building_permissions_etl_spark.functions.portable import PORTABLE_HASH_SQL
from building_permissions_etl_spark.operators.dedup import MERSENNE_P, _perm_params

# Rotation-densification constants — must mirror operators/dedup.py.
OPH_PROBE = 8
OPH_MIX = 0x9E3779B1


def _ph(x: str) -> str:
    return PORTABLE_HASH_SQL.format(x=x)


def _pair_tail(
    bands: int, r: int, k: int, min_est: float, max_bucket: int | None
) -> str:
    """Shared banding + candidate-join + estimator tail over a
    ``sigs(doc_id, sig)`` CTE: each band's r-slice (as a string key)
    buckets the corpus; buckets above ``max_bucket`` are dropped exactly
    as in the Spark operator; pairs come from the within-bucket
    equi-join; est = fraction of equal components. The string band key
    and Spark's 64-bit band hash induce the same equivalence classes."""
    banded_selects = "\n          UNION ALL ".join(
        f"SELECT doc_id, sig, {b} AS band, "
        f"CAST(sig[{b * r + 1}:{b * r + r}] AS VARCHAR) AS key FROM sigs"
        for b in range(bands)
    )
    cap = f"WHERE bsz <= {max_bucket}" if max_bucket else ""
    return f"""
        banded AS (
          {banded_selects}
        ),
        capped AS (
          SELECT doc_id, sig, band, key FROM (
            SELECT *, count(*) OVER (PARTITION BY band, key) AS bsz
            FROM banded
          ) {cap}
        ),
        pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                          a.sig AS sig_a, b.sig AS sig_b
          FROM capped a JOIN capped b
            ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
        ),
        scored AS (
          SELECT id_a, id_b,
                 list_sum(list_transform(range(1, {k + 1}),
                   i -> CASE WHEN sig_a[i] = sig_b[i] THEN 1 ELSE 0 END)) AS neq
          FROM pairs
        )
        SELECT id_a, id_b, neq / {float(k)} AS est_jaccard FROM scored
        WHERE neq / {float(k)} >= {min_est}
        ORDER BY id_a, id_b
    """


def minhash_lsh_sql(
    shingles_sql: str, k: int = 64, bands: int = 16, min_est: float = 0.5,
    max_bucket: int | None = 1000,
) -> str:
    r = k // bands
    perms = _perm_params(k)
    sig_exprs = ",\n            ".join(
        f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {MERSENNE_P}))"
        for a, b in perms
    )
    return f"""
        WITH t AS (
          SELECT doc_id,
                 list_transform({shingles_sql}, s -> {_ph('s')} % {MERSENNE_P}) AS hs
          FROM documents
        ),
        sigs AS (
          SELECT doc_id, [
            {sig_exprs}
          ] AS sig FROM t
        ),
        {_pair_tail(bands, r, k, min_est, max_bucket)}
    """


def minhash_lsh_incremental_sql(
    shingles_sql: str, batch_pred: str, k: int = 64, bands: int = 16,
    min_est: float = 0.5, max_bucket: int | None = 1000,
) -> str:
    """Delta-vs-corpus twin of ``minhash_lsh_sql``: documents matching
    ``batch_pred`` are the delta, the rest the corpus; the hot-bucket
    cap counts CORPUS occupancy only (mirroring the Spark operator,
    where a flooded corpus bucket is dropped before the probe join)."""
    r = k // bands
    perms = _perm_params(k)
    sig_exprs = ",\n            ".join(
        f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {MERSENNE_P}))"
        for a, b in perms
    )
    banded_selects = "\n          UNION ALL ".join(
        f"SELECT doc_id, sig, is_batch, {b} AS band, "
        f"CAST(sig[{b * r + 1}:{b * r + r}] AS VARCHAR) AS key FROM sigs"
        for b in range(bands)
    )
    cap = f"WHERE bsz <= {max_bucket}" if max_bucket else ""
    return f"""
        WITH t AS (
          SELECT doc_id, ({batch_pred}) AS is_batch,
                 list_transform({shingles_sql}, s -> {_ph('s')} % {MERSENNE_P}) AS hs
          FROM documents
        ),
        sigs AS (
          SELECT doc_id, is_batch, [
            {sig_exprs}
          ] AS sig FROM t
        ),
        banded AS (
          {banded_selects}
        ),
        corpus_capped AS (
          SELECT doc_id, sig, band, key FROM (
            SELECT *, count(*) OVER (PARTITION BY band, key) AS bsz
            FROM banded WHERE NOT is_batch
          ) {cap}
        ),
        batch_side AS (
          SELECT doc_id, sig, band, key FROM banded WHERE is_batch
        ),
        pairs AS (
          SELECT DISTINCT n.doc_id AS batch_id, c.doc_id AS corpus_id,
                          n.sig AS sig_a, c.sig AS sig_b
          FROM batch_side n JOIN corpus_capped c
            ON n.band = c.band AND n.key = c.key
        ),
        scored AS (
          SELECT batch_id, corpus_id,
                 list_sum(list_transform(range(1, {k + 1}),
                   i -> CASE WHEN sig_a[i] = sig_b[i] THEN 1 ELSE 0 END)) AS neq
          FROM pairs
        )
        SELECT batch_id, corpus_id, neq / {float(k)} AS est_jaccard
        FROM scored
        WHERE neq / {float(k)} >= {min_est}
        ORDER BY batch_id, corpus_id
    """


def minhash_oph_sql(
    shingles_sql: str, k: int = 64, bands: int = 16, min_est: float = 0.5,
    max_bucket: int | None = 1000,
) -> str:
    r = k // bands
    probes = ",\n              ".join(
        f"bins[(i + {j}) % {k} + 1] + {j * OPH_MIX}" for j in range(OPH_PROBE)
    )
    return f"""
        WITH t AS (
          SELECT doc_id,
                 list_transform({shingles_sql}, s -> {_ph('s')} % {MERSENNE_P}) AS hs
          FROM documents
        ),
        binned AS (
          SELECT doc_id, hs,
                 list_transform(range(0, {k}),
                   b -> list_min(list_filter(hs, h -> h % {k} = b))) AS bins
          FROM t
        ),
        sigs AS (
          SELECT doc_id, list_transform(range(0, {k}), i -> coalesce(
              {probes},
              list_min(hs) + i * {OPH_MIX})) AS sig
          FROM binned
        ),
        {_pair_tail(bands, r, k, min_est, max_bucket)}
    """


def simhash_sql(
    toks_sql: str, max_hamming: int = 3, max_bucket: int | None = 1000
) -> str:
    # two's-complement bit values: bit 63 is min-long
    fold = "\n            + ".join(
        "CASE WHEN coalesce(list_sum(list_transform(hs, "
        f"h -> CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END)), 0) > 0 "
        f"THEN {(1 << i) if i < 63 else -(1 << 63)} ELSE 0 END"
        for i in range(64)
    )
    chunk_selects = "\n          UNION ALL ".join(
        f"SELECT doc_id, fp, {i} AS chunk, (fp >> {i * 16}) & 65535 AS cv FROM fps"
        for i in range(4)
    )
    cap = f"WHERE bsz <= {max_bucket}" if max_bucket else ""
    return f"""
        WITH t AS (
          SELECT doc_id, list_transform({toks_sql}, tk -> {_ph('tk')}) AS hs
          FROM documents
        ),
        fps AS (
          SELECT doc_id, (
              {fold}
          ) AS fp FROM t
        ),
        chunks AS (
          {chunk_selects}
        ),
        capped AS (
          SELECT doc_id, fp, chunk, cv FROM (
            SELECT *, count(*) OVER (PARTITION BY chunk, cv) AS bsz
            FROM chunks
          ) {cap}
        )
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
        FROM capped a JOIN capped b
          ON a.chunk = b.chunk AND a.cv = b.cv AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.fp, b.fp)) <= {max_hamming}
        ORDER BY id_a, id_b
    """


def lsh_topk_sql(
    planes: list[list[float]],
    query_id: int = 0,
    k: int = 10,
    hamming_probe: int = 1,
    dim: int = 64,
) -> str:
    """DuckDB replica of ``build_lsh_index`` + ``query_lsh``: the
    hyperplanes are plan literals (deterministic LCG + Box-Muller), so
    the oracle recomputes the same sign-bit buckets, multi-probes within
    the hamming radius, and exact-reranks — value-checking the whole LSH
    path. Float literals are emitted via repr (round-trip exact); the dot
    product mirrors Spark's sequential double fold, verified bit-exact
    for the cosine oracles in round 1."""
    def dot_plane(p: list[float]) -> str:
        lits = "[" + ", ".join(repr(float(c)) for c in p) + "]"
        return (f"list_sum(list_transform(range(1, {dim + 1}), "
                f"j -> CAST(embedding[j] AS DOUBLE) * ({lits})[j]))")

    bucket = "\n            + ".join(
        f"CASE WHEN {dot_plane(p)} > 0 THEN {1 << i} ELSE 0 END"
        for i, p in enumerate(planes)
    )
    dot_q = (f"list_sum(list_transform(range(1, {dim + 1}), "
             "j -> CAST(embedding[j] AS DOUBLE) * CAST(qv[j] AS DOUBLE)))")
    nrm = ("sqrt(list_sum(list_transform(range(1, {d} + 1), "
           "j -> CAST({v}[j] AS DOUBLE) * CAST({v}[j] AS DOUBLE))))")
    cos = (f"({dot_q}) / greatest({nrm.format(v='embedding', d=dim)} * "
           f"{nrm.format(v='qv', d=dim)}, 1e-12)")
    return f"""
        WITH b AS (
          SELECT vec_id, embedding, (
            {bucket}
          ) AS bucket FROM embeddings
        ),
        q AS (
          SELECT embedding AS qv, bucket AS qb FROM b WHERE vec_id = {query_id}
        )
        SELECT vec_id AS id, round({cos}, 6) AS score
        FROM b, q
        WHERE vec_id <> {query_id}
          AND bit_count(xor(CAST(bucket AS BIGINT), CAST(qb AS BIGINT)))
              <= {hamming_probe}
        ORDER BY score DESC, id LIMIT {k}
    """


def ivf_topk_sql(
    centroids: list[list[float]],
    query_id: int = 0,
    k: int = 10,
    n_probe: int = 4,
    dim: int = 64,
) -> str:
    """DuckDB replica of ``build_ivf_index_portable`` + ``query_ivf_portable``:
    the centroids are plan literals (same LCG+Box-Muller generator as the
    LSH planes), so the oracle recomputes the per-row nearest-centroid
    cell (argmax, first index on ties), the query's top-``n_probe`` cell
    set (rank by score desc, cell asc), and the exact cosine rerank —
    value-checking the whole IVF path. All math is sequential double
    folds, bit-exact across engines (see lsh_topk_sql)."""
    n_cells = len(centroids)

    def dot_cent(p: list[float]) -> str:
        lits = "[" + ", ".join(repr(float(c)) for c in p) + "]"
        ce = f"CAST(({lits})[j] AS DOUBLE)"
        d = (f"list_sum(list_transform(range(1, {dim + 1}), "
             f"j -> CAST(embedding[j] AS DOUBLE) * {ce}))")
        nc = (f"sqrt(list_sum(list_transform(range(1, {dim + 1}), "
              f"j -> {ce} * {ce})))")
        ne = ("sqrt(list_sum(list_transform(range(1, {d} + 1), "
              "j -> CAST(embedding[j] AS DOUBLE) * CAST(embedding[j] AS DOUBLE))))"
              ).format(d=dim)
        return f"({d}) / greatest({ne} * {nc}, 1e-12)"

    cs = "[\n            " + ",\n            ".join(
        dot_cent(p) for p in centroids
    ) + "\n          ]"
    dot_q = (f"list_sum(list_transform(range(1, {dim + 1}), "
             "j -> CAST(embedding[j] AS DOUBLE) * CAST(qv[j] AS DOUBLE)))")
    nrm = ("sqrt(list_sum(list_transform(range(1, {d} + 1), "
           "j -> CAST({v}[j] AS DOUBLE) * CAST({v}[j] AS DOUBLE))))")
    cos_q = (f"({dot_q}) / greatest({nrm.format(v='embedding', d=dim)} * "
             f"{nrm.format(v='qv', d=dim)}, 1e-12)")
    return f"""
        WITH c AS (
          SELECT vec_id, embedding, {cs} AS cs
          FROM embeddings
        ),
        a AS (
          SELECT vec_id, embedding, cs,
                 CAST(list_position(cs, list_max(cs)) - 1 AS INT) AS cell
          FROM c
        ),
        q AS (
          SELECT embedding AS qv, cs AS qs FROM a WHERE vec_id = {query_id}
        )
        SELECT vec_id AS id, round({cos_q}, 6) AS score
        FROM a, q
        WHERE vec_id <> {query_id}
          AND len(list_filter(range(1, {n_cells + 1}),
                j -> qs[j] > qs[cell + 1]
                     OR (qs[j] = qs[cell + 1] AND j - 1 < cell))) < {n_probe}
        ORDER BY score DESC, id LIMIT {k}
    """


def multimodal_features_sql(n_features: int = 8, cap: int = 4096) -> str:
    """DuckDB replica of assets_from_documents → extract_features(fake):
    payload = utf-8 bytes of text, features = byte-histogram ratios over
    the first ``cap`` bytes, TRUNCATED at 6 decimals (double-exact in
    both engines; see _fake_features). Byte values come from the hex
    encoding since DuckDB blobs aren't indexable. Verifies the whole
    mapInPandas decode plumbing — batch iteration, null/empty handling,
    schema — against independent SQL."""
    fcols = ",\n               ".join(
        f"CASE WHEN total = 0 THEN 0.0 ELSE "
        f"trunc((cnts[{k + 1}] / total) * 1000000.0) / 1000000.0 END AS f{k}"
        for k in range(n_features)
    )
    return f"""
        WITH a AS (
          SELECT doc_id AS asset_id,
                 CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                      WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                 -- NULL text mirrors Spark's null-payload contract:
                 -- n_bytes 0 and all-zero features, not NULLs
                 encode(coalesce(text, '')) AS payload
          FROM documents
        ),
        b AS (
          SELECT asset_id, kind,
                 CAST(octet_length(payload) AS BIGINT) AS n_bytes,
                 list_transform(
                   range(0, least(octet_length(payload), {cap})),
                   i -> CAST(CONCAT('0x', substr(hex(payload), 2 * i + 1, 2))
                             AS INT) % {n_features}) AS bk
          FROM a
        ),
        c AS (
          SELECT asset_id, kind, n_bytes,
                 list_transform(range(0, {n_features}),
                   k -> CAST(len(list_filter(bk, x -> x = k)) AS DOUBLE)) AS cnts,
                 CAST(len(bk) AS DOUBLE) AS total
          FROM b
        )
        SELECT asset_id, kind, n_bytes,
               {fcols}
        FROM c ORDER BY asset_id
    """


def fingerprint_sql(toks_sql: str, window: int = 4) -> str:
    mins_str = ("array_to_string(list_transform(mins, "
                "m -> CAST(m AS VARCHAR)), ',')")
    return f"""
        WITH t AS (
          SELECT doc_id, list_transform({toks_sql}, tk -> {_ph('tk')}) AS hs
          FROM documents
        ),
        m AS (
          SELECT doc_id,
                 CASE WHEN len(hs) >= {window} THEN
                   list_transform(range(0, len(hs) - {window} + 1),
                     i -> list_min(hs[i + 1 : i + {window}]))
                 ELSE [list_min(hs)] END AS mins
          FROM t
        )
        SELECT doc_id AS id, {_ph(mins_str)} AS fingerprint
        FROM m ORDER BY id
    """


def bloom_regs_sql(pred: str,
                   key_sql: str = "CAST(o_custkey AS VARCHAR)",
                   table: str = "orders") -> str:
    """Blocked-Bloom register build over ``table`` rows matching
    ``pred`` — the DuckDB twin of
    ``operators/maintenance.bloom_registers`` (portable md5-prefix
    hash, affine second probe, word/bit split), hoisted here in round
    12 so the algebra lives in ONE place for the round-9 union oracle
    and the round-12 persisted-probe oracle; the geometry and affine
    constants are imported from the operator module, so a change there
    changes both engines together. Emits round-9's exact text, so
    ``bloom_incremental_union``'s oracle is byte-stable across the
    hoist (pinned by tests/test_round13_plan_shape.py::
    test_bloom_union_oracle_text_is_stable — a sha256 over the emitted
    SQL, so a drift in the maintenance-module geometry/affine
    constants fails a test instead of silently rewriting a
    windowed-out oracle)."""
    from building_permissions_etl_spark.operators.maintenance import (
        BLOOM_AFFINE_ADD,
        BLOOM_AFFINE_MOD,
        BLOOM_AFFINE_MUL,
        BLOOM_BITS,
        BLOOM_WORDS,
    )

    h1 = _ph(key_sql)
    return f"""
          SELECT CAST(h % {BLOOM_WORDS} AS INT) AS word_idx,
                 bit_or(CAST(1 AS BIGINT)
                        << CAST((h // {BLOOM_WORDS}) % {BLOOM_BITS}
                                AS INT)) AS bits
          FROM (
            SELECT unnest([h1,
                           (h1 % {BLOOM_AFFINE_MOD}) * {BLOOM_AFFINE_MUL} + {BLOOM_AFFINE_ADD}]) AS h
            FROM (SELECT {h1} AS h1 FROM {table} WHERE {pred})
          ) GROUP BY 1"""
