"""Document deduplication: exact, word-set, MinHash+LSH, SimHash,
n-gram Jaccard, and mean-centered SRP embedding-cosine (full,
persisted-index, and incremental per-ingest paths for both the MinHash
and SRP families).

Scale design (100 TB): every stage is per-row array math (codegen'd
higher-order functions) until the final shuffle, which is always on a
hash-distributed key (md5 fingerprint or LSH band key) — uniform
partitioning, no hot keys.  The LSH candidate join is an equi-join on
(band_index, band_hash) whose per-bucket cardinality is bounded by design
(near-dup clusters), so the pair explosion the naive O(n^2) approach has
never happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_release_1_10_0_spark.llm.text import (ensure_min_parallelism,
                                                 hash64_expr, hash128_expr,
                                                 words_expr)


# Band count above which the candidate stage abandons the
# first-matching-band join (whose null-safe predicate list grows
# quadratically in bands) for the explode + distinct formulation —
# see the geometry note inside ``minhash_lsh_pairs``.
_FIRST_MATCH_MAX_BANDS = 8


def with_words(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("words", F.expr(words_expr(text_col)))


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Exact dedup by md5 of raw text: one representative (min id) per
    group + duplicate count."""
    return (df.groupBy(F.md5(F.col(text_col)).alias("fingerprint"))
              .agg(F.min(id_col).alias("rep_id"), F.count("*").alias("n_dups")))


def wordset_dedup_groups(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Order-insensitive exact dedup: fingerprint = md5 of the sorted
    distinct word set (catches shuffled/reordered copies)."""
    d = with_words(df, text_col)
    return (d.withColumn("fingerprint",
                         F.expr("md5(concat_ws(' ', array_sort(array_distinct(words))))"))
             .groupBy("fingerprint")
             .agg(F.min(id_col).alias("rep_id"), F.count("*").alias("n_dups")))


def _salted_hash(i: int, method: str) -> str:
    """Per-permutation word-hash expression over lambda variable ``w``."""
    if method == "xxhash64":
        # seed the permutation with a literal extra column — no string
        # concat, no hex decode: stays a single JVM hash call per word
        return f"xxhash64({i}L, w)"
    return hash64_expr(f"concat('{i}:', w)")


# THE canonical signature / band-key formulas — shared by the full
# pipeline (minhash_lsh_pairs), the signature query (minhash_signatures)
# and the PERSISTED index (minhash_index): the index outlives the code
# that wrote it, so a formula change here is a declared index-format
# change, never a silent drift between writer and reader.
#
# md5-path format v2 (round 12): ONE md5 digest per word, split into
# (h1 = 60-bit, h2 = 56-bit); permutation i is the universal hash
# h_i(w) = (sum_j a_{i,j} * u_j(w)) mod p over p = 2^31-1, where
# u_0..u_3 are four ~30-bit lanes split arithmetically from (h1, h2)
# and a_{i,j} are fixed seeded constants (shared with the oracle by
# import — lockstep by construction).  One strong base digest, k cheap
# arithmetic permutations: the datasketch construction.  v1 computed k
# independent salted digests (8x the md5 work; signature stage measured
# 2.7x slower at sf0.1).
#
# Family quality, measured against exact ground truth at sf0.01
# (16,420 unique-wordset pairs with J >= 0.8; ideal-family expected
# recall for this J-distribution and the k=8/rows=4 s-curve = 0.758):
#   v1 independent digests   0.814  (above ideal — favorable variance)
#   affine (h1 + i*h2) % M   0.716  (REJECTED: argmin order preserved
#                                    across i — one small-(h1,h2) word
#                                    minimizes every permutation; 2.5x
#                                    candidate volume, below-ideal
#                                    recall)
#   4-lane linear (this)     0.744  (at ideal within noise)
# Precision is always 1.0 — the exact-Jaccard verify stage gates every
# candidate.  Recall at the s-curve margin is the usual LSH trade; the
# cheap-permutation form makes k the lever (raising k/bands costs
# arithmetic, not digests).  31-bit operands keep every product under
# 2^62: no BIGINT overflow on either engine.  Indexes written under v1
# must be rebuilt (declared format change).
_PERM_P = (1 << 31) - 1
#: index-format markers: minhash_index stamps every row with the
#: (method, formula-version) it was written under, and
#: lsh_incremental_pairs REFUSES an index whose marker does not match
#: the formulas it is about to join against — a v1-written artifact
#: joined by v2 band keys would otherwise produce ~zero candidates
#: (silent recall collapse, no error).  Bump the version here whenever
#: the signature/band-key formulas change for a method.
_INDEX_FORMATS = {"md5": "md5.v2", "xxhash64": "xxhash64.v1"}
#: same contract for the other two persisted-index families: the SRP
#: index stamps its sign-projection formula version, the semantic index
#: its k-means assignment contract version; the incremental readers
#: refuse a mismatch (see _check_index_format)
_SRP_FORMAT = "srp.v1"
_SEMANTIC_FORMAT = "sem.v1"


def _check_index_format(label: str, frame: DataFrame, expect: str) -> None:
    """Refuse a persisted-index frame whose format marker is missing or
    differs from the formulas the caller is about to join against —
    writer/reader formula drift silently produces ~zero candidates
    (recall collapse), so it must be a loud error.  One first() = one
    row-group read, per-ingest cost."""
    if "fmt" not in frame.columns:
        raise ValueError(
            f"{label} carries no 'fmt' format marker — a pre-versioned "
            f"index artifact; rebuild it (declared index-format change)")
    row = frame.select("fmt").first()
    if row is not None and row[0] != expect:
        raise ValueError(
            f"{label} was written under format {row[0]!r} but this join "
            f"expects {expect!r} — rebuild the index with the current "
            f"formulas")
#: 128 seeded coefficients (k up to 32): permutation i uses _PERM_C[4*i .. 4*i+3]
_PERM_C = [
           1864550318, 1254492529, 1007102569, 751060713, 2027691200,
           1622456154, 1840951293, 1001143908, 616008998, 20460338,
           1595354702, 804972048, 1542395096, 1972905681, 1725210604,
           863803602, 316175860, 1410109831, 1775573246, 770482499,
           1041917222, 1989053642, 704225832, 1923919257, 1701645196,
           997927658, 857565296, 421551116, 133847858, 476697126,
           277455873, 814075906, 382193402, 1809204182, 1947188797,
           1435748140, 1802248383, 1617874108, 1366004399, 741749417,
           2049709813, 624682699, 1256990088, 2001929687, 882834612,
           235210066, 310317784, 42998692, 596974558, 667906862,
           1148057240, 74656420, 1673431874, 1397939260, 1439814816,
           341212018, 672744904, 95550874, 1338207527, 451387743,
           142627970, 2090109513, 78592799, 1235972375, 1278077768,
           1601154631, 858237787, 703717360, 1132795216, 464310863,
           900671225, 609106318, 1206703823, 1112266000, 776840463,
           529014229, 62741789, 1283952509, 513886135, 1142818323,
           1178227947, 126849758, 1271568178, 1559706730, 1407272352,
           777795990, 184697174, 478805720, 1990458795, 1944690073,
           190350761, 1715639092, 295392457, 1609910987, 1712986921,
           1062666365, 327633474, 181878289, 132751349, 1225325373,
           460793681, 1030700378, 1831239876, 834589807, 495659576,
           1606188350, 1632508139, 1722711876, 1110615554, 518268935,
           447749473, 1643376970, 1188785007, 1136176368, 85192540,
           804751622, 1006643413, 1920781913, 2082246482, 66049228,
           568796324, 1334768262, 514865796, 780863499, 1344308243,
           1735490980, 310220659, 807546023]#: lane split: u0/u1 = low/high 30 bits of h1, u2/u3 = low/high 28 of h2
_PERM_LANES = ["(h.h1 % 1073741824L)", "(h.h1 div 1073741824L)",
               "(h.h2 % 268435456L)", "(h.h2 div 268435456L)"]

#: per-word base-hash array over ``ws`` (md5 path): array<struct<h1,h2>>
_HWS_EXPR = ("transform(ws, w -> named_struct("
             "'h1', cast(conv(substr(md5(w), 1, 15), 16, 10) as bigint), "
             "'h2', cast(conv(substr(md5(w), 17, 14), 16, 10) as bigint)))")


def _sig_exprs(k: int, method: str) -> list[str]:
    """k MinHash signature expressions; the xxhash64 path reads the
    distinct-word array ``ws``, the md5 path reads the precomputed
    base-hash array ``hws`` (= ``_HWS_EXPR`` over ws, materialized once
    so the digest runs once per word, not once per permutation)."""
    if method == "xxhash64":
        return [f"array_min(transform(ws, w -> {_salted_hash(i, method)}))"
                for i in range(k)]
    assert 4 * k <= len(_PERM_C), "extend _PERM_C for larger k"
    out = []
    for i in range(k):
        terms = " + ".join(
            f"({_PERM_C[4 * i + j]}L * {_PERM_LANES[j]}) % {_PERM_P}L"
            for j in range(4))
        out.append(f"array_min(transform(hws, h -> ({terms}) % {_PERM_P}L))")
    return out


def _with_hws(df: DataFrame, method: str) -> DataFrame:
    """Attach the md5-path base-hash column (no-op for xxhash64)."""
    if method == "xxhash64":
        return df
    return df.withColumn("hws", F.expr(_HWS_EXPR))



def _wh_expr(method: str) -> str:
    """Compact word-hash-set expression: for md5, h1 of the shared
    per-word base hash (hws) — the SAME value hash64_expr('w') yields,
    without a second digest pass; for xxhash64, the direct per-word
    native hash."""
    if method == "xxhash64":
        return f"array_distinct(transform(ws, w -> {hash64_expr('w', 'xxhash64')}))"
    return "array_distinct(transform(hws, h -> h.h1))"


def _band_key_exprs(k: int, band_rows: int, method: str) -> list[str]:
    """One 60-bit band-key expression per band over columns m0..m{k-1}."""
    out = []
    for b in range(k // band_rows):
        ms = [f"m{b * band_rows + r}" for r in range(band_rows)]
        if method == "xxhash64":
            # multi-arg native hash of the band's signature slice
            out.append(f"xxhash64({b}L, {', '.join(ms)})")
        else:
            cols = "||'_'||".join(f"cast({m} as string)" for m in ms)
            out.append(hash64_expr(f"md5({cols})"))
    return out


def minhash_signatures(df: DataFrame, id_col: str, text_col: str = "text",
                       k: int = 8, method: str = "md5") -> DataFrame:
    """K-permutation MinHash over the distinct word set.  Hash family:
    ``h_i(w) = hash64(i, w)``.  ``method='md5'`` is engine-portable
    (oracle-checkable); ``method='xxhash64'`` is the JVM-native
    production path (~2× on the signature stage — k hashes per word).
    Returns id + m0..m{k-1} BIGINT columns.  The md5 path digests each
    word ONCE and derives the k permutations arithmetically (format v2
    — see the _PERM_P / _PERM_C comment block)."""
    d = with_words(df, text_col).withColumn("ws", F.expr("array_distinct(words)"))
    d = _with_hws(d, method)
    sig_cols = [F.expr(e).alias(f"m{i}")
                for i, e in enumerate(_sig_exprs(k, method))]
    return d.select(F.col(id_col), *sig_cols)


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str = "text",
                      k: int = 8, band_rows: int = 4,
                      threshold: float = 0.8, method: str = "md5") -> DataFrame:
    """MinHash + LSH banding + exact-Jaccard verification.

    Scale design (the version that survives 100 TB):

    1. **Collapse identical word-sets first.** Exact-duplicate clusters are
       the dominant duplicate mass; their pairs need no verification
       (Jaccard = 1 by construction).  Signatures, banding, candidate
       generation and verification all run over *unique* word-sets, so a
       10k-copy boilerplate document costs one signature, not 10k² pair
       verifications.
    2. **Band size matches the threshold.** LSH's s-curve midpoint is
       t ≈ (1/bands)^(1/rows); for threshold 0.8 with k=8 that is
       rows=4/bands=2 (t≈0.84).  rows=2/bands=4 targets t≈0.5 and floods
       the candidate join with every moderately-similar pair (measured:
       84% of ALL pairs became candidates on the synthetic corpus).
    3. **Expand at the end.** Verified set-level pairs join back to the
       membership table; intra-cluster pairs are emitted directly with
       Jaccard 1.0.  This stage is output-cardinality work — unavoidable
       for pair-list semantics, and zero wasted verification.

    ``method='md5'`` keeps every hash engine-portable (the oracle gate
    recomputes them in DuckDB); ``method='xxhash64'`` swaps in Spark's
    native xxHash64 for signatures, band keys, word hashes and the
    document fingerprint — same algorithm, same verification (exact
    Jaccard on the true word sets).  Measured ~1.35× faster end-to-end
    at sf0.1 (13.7s -> 10.2s): hashing is NOT the dominant cost on
    skew-bucketed corpora — candidate-pair materialization is (see the
    order-of-operations note below) — so the native hash buys exactly
    the signature/banding share of the runtime.
    """
    n_bands = k // band_rows
    # guide §2.5: a 1-split source serializes the words/fingerprint map
    # stage; rebalance exactly when the scan is narrower than the session
    # parallelism (identity at scale — see ensure_min_parallelism)
    df = ensure_min_parallelism(df)
    # key-width policy: band keys and word hashes are 60-bit BIGINTs
    # (8-byte shuffle keys, bigint array intersects — ~2× on the verify
    # stage vs md5 strings, measured); a collision there only adds a
    # candidate pair that exact verification rejects, so 60 bits are
    # benign.  The document IDENTITY ``fp`` is different: a collision
    # MERGES distinct documents and emits wrong pairs, and 60 bits hit
    # 50% birthday probability at ~1.3e9 docs — below 100 TB scale.  fp
    # is therefore a 120-bit struct<h1,h2 bigint> (16-byte keys,
    # collision-safe past 1e18 docs); the oracle compares only the
    # (id_a, id_b, jaccard) output.
    d = (with_words(df, text_col)
         .select(F.col(id_col),
                 F.expr("array_sort(array_distinct(words))").alias("ws"))
         .withColumn("fp", F.expr(hash128_expr("concat_ws(' ', ws)", method))))
    # ONE aggregation carries both the unique word-sets and the cluster
    # membership: every downstream branch (signatures, word hashes,
    # member expansion) hangs off this exchange, so the corpus scan +
    # per-doc fingerprint md5 run ONCE and Spark reuses the shuffle
    # (ReusedExchange) instead of re-reading the text for each branch
    # (measured r6: the members/uniq split re-scanned the corpus).
    # ONE materialization carries both the unique word-sets and the
    # cluster membership.  ReusedExchange only deduplicates the corpus
    # pass WITHIN a single job; the downstream branches (keyed
    # checkpoint, wh / members broadcast builds) run as separate jobs,
    # and each would re-execute the scan + words + fingerprint md5 +
    # shuffle (measured: three ~330ms 32-task upstream replays per run).
    # Checkpointing the deduped frame runs the corpus pass exactly once
    # per run at any scale — the materialize-the-intermediate trade of
    # guide §3.3, sized at |unique word-sets|.
    clusters = (d.groupBy("fp")
                .agg(F.first("ws").alias("ws"),
                     F.collect_list(id_col).alias("ids"))
                .localCheckpoint(eager=False))
    members = clusters.select("fp", F.explode("ids").alias(id_col))
    uniq = (_with_hws(clusters.drop("ids"), method)
            .withColumn("wh", F.expr(_wh_expr(method))))

    sig_cols = [F.expr(e).alias(f"m{i}")
                for i, e in enumerate(_sig_exprs(k, method))]
    sigs = uniq.select("fp", *sig_cols)

    keyed = sigs.select(
        "fp", *[F.expr(kx).alias(f"bk{b}")
                for b, kx in enumerate(_band_key_exprs(k, band_rows,
                                                       method))])
    # materialize once: ``keyed`` is consumed 2x per band (bucket-size
    # aggregation + join probe), and each consumer would re-evaluate the
    # k-permutation signature hashes over every word (the md5 path's
    # dominant CPU, measured r6).  The frame is narrow and bounded —
    # |unique word-sets| rows x (16-byte fp + n_bands bigints), no text,
    # no arrays — so executor-local materialization is cheap at any
    # scale and deletes 3 of the 4 signature evaluations.
    keyed = keyed.localCheckpoint(eager=False)

    # candidate generation (measured r6, replacing explode + self-join +
    # distinct): one self-join PER BAND with the classic first-matching-
    # band emission rule — band b emits a pair only when no EARLIER band
    # key also matched (null-safe inequality), so the union is
    # duplicate-free BY CONSTRUCTION and the 2.4M-row distinct() shuffle
    # disappears (the dominant candidate-stage cost at sf0.1).  Each
    # band join is also pruned to multi-occupancy buckets first: a
    # narrow count aggregation finds keys held by >1 word-set and a
    # semi-join drops singleton rows BEFORE the join — most buckets
    # cannot emit a pair and never reach the expensive stage.
    # GEOMETRY GUARD: band b's first-matching-band join carries b
    # null-safe inequalities, so the per-band predicate work grows
    # quadratically in n_bands — ideal at the default 2 bands, wrong at
    # a k=128/rows=4 geometry (32 self-joins with up to 31 extra
    # predicates each).  Above _FIRST_MATCH_MAX_BANDS the candidate
    # stage switches to the explode formulation: one (band, key)
    # self-join + one pair distinct — a single extra shuffle that is
    # independent of band count.
    if n_bands <= _FIRST_MATCH_MAX_BANDS:
        parts = []
        for b in range(n_bands):
            multi = (keyed.groupBy(f"bk{b}")
                     .agg(F.count(F.lit(1)).alias("bn"))
                     .filter(F.col("bn") > 1)
                     .select(f"bk{b}"))
            pruned = keyed.join(multi, [f"bk{b}"], "leftsemi")
            a = pruned.alias("a")
            bb = pruned.alias("b")
            cond = ((F.col(f"a.bk{b}") == F.col(f"b.bk{b}"))
                    & (F.col("a.fp") < F.col("b.fp")))
            for j in range(b):
                # null-safe: a null earlier key never matched, so it
                # must not suppress emission here
                cond = cond & ~F.col(f"a.bk{j}").eqNullSafe(F.col(f"b.bk{j}"))
            parts.append(a.join(bb, cond)
                         .select(F.col("a.fp").alias("fp_a"),
                                 F.col("b.fp").alias("fp_b")))
        cand = parts[0]
        for p in parts[1:]:
            cand = cand.unionByName(p)
    else:
        exploded = keyed.select(
            "fp", F.posexplode(F.array(
                *[F.col(f"bk{b}") for b in range(n_bands)])).alias("b", "bk"))
        multi = (exploded.groupBy("b", "bk")
                 .agg(F.count(F.lit(1)).alias("bn"))
                 .filter(F.col("bn") > 1)
                 .select("b", "bk"))
        pruned = exploded.join(multi, ["b", "bk"], "leftsemi")
        a = pruned.alias("a")
        bb = pruned.alias("x")
        cand = (a.join(bb, ["b", "bk"])
                 .filter(F.col("a.fp") < F.col("x.fp"))
                 .select(F.col("a.fp").alias("fp_a"),
                         F.col("x.fp").alias("fp_b"))
                 .distinct())

    # slim word-hash frame; derived from the clusters checkpoint, so the
    # two verify-side broadcast builds replay only hws + array_distinct
    # over materialized rows, never the corpus pass
    wh = uniq.select("fp", "wh", F.expr("size(wh)").alias("nw"))
    # verification (measured r6, 2.4M candidate pairs at sf0.1):
    # 1. size prefilter — J >= t forces min(|a|,|b|) >= t*max(|a|,|b|),
    #    an exact implication checked on two ints before any intersect;
    # 2. the `+ cast(rand()*0 as int)` marker (always adds zero) makes
    #    ``ni`` nondeterministic so Catalyst can NEITHER push the
    #    jaccard filter into the join condition NOR collapse the
    #    projection — without it the filter lands in the join and
    #    evaluates array_intersect TWICE per pair (12.8s -> 7.5s for
    #    this stage with the barrier; the pushed-in variant re-measured
    #    SLOWER than no prefilter at all).
    ver = (cand.join(wh.select(F.col("fp").alias("fp_a"),
                               F.col("wh").alias("wh_a"),
                               F.col("nw").alias("nw_a")), "fp_a")
               .join(wh.select(F.col("fp").alias("fp_b"),
                               F.col("wh").alias("wh_b"),
                               F.col("nw").alias("nw_b")), "fp_b")
               .filter(f"least(nw_a, nw_b) >= {threshold} * greatest(nw_a, nw_b)")
               # wh are distinct sets: |union| = |a| + |b| - |intersect|
               .select("fp_a", "fp_b",
                       F.expr("size(array_intersect(wh_a, wh_b)) "
                              "+ cast(rand()*0 as int)").alias("ni"),
                       F.expr("nw_a + nw_b").alias("ns"))
               .withColumn("jaccard",
                           F.expr("round(ni / cast(ns - ni as double), 6)"))
               .filter(F.col("jaccard") >= threshold)
               .select("fp_a", "fp_b", "jaccard"))

    # intra-cluster pairs: identical word sets, Jaccard exactly 1.0
    mx = members.alias("x")
    my = members.alias("y")
    intra = (mx.join(my, (F.col("x.fp") == F.col("y.fp"))
                     & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")))
               .select(F.col(f"x.{id_col}").alias("id_a"),
                       F.col(f"y.{id_col}").alias("id_b"),
                       F.lit(1.0).alias("jaccard")))
    # cross-cluster expansion of verified set-level pairs
    cross = (ver.join(members.select(F.col("fp").alias("fp_a"),
                                     F.col(id_col).alias("ida")), "fp_a")
                .join(members.select(F.col("fp").alias("fp_b"),
                                     F.col(id_col).alias("idb")), "fp_b")
                .select(F.least("ida", "idb").alias("id_a"),
                        F.greatest("ida", "idb").alias("id_b"),
                        "jaccard"))
    return intra.unionByName(cross)


def minhash_index(df: DataFrame, id_col: str, text_col: str = "text",
                  k: int = 8, band_rows: int = 4,
                  method: str = "md5") -> DataFrame:
    """Per-document LSH index row: the persisted artifact incremental
    dedup joins new batches against.

    Columns: ``id, nw (distinct-word count), wh (compact word-hash set,
    bigint), bk0..bk{n_bands-1} (band keys), fmt (format marker — the
    (method, formula-version) the rows were written under; constant, so
    parquet RLE stores it for free)``.  In production this frame
    is written ONCE per corpus snapshot — a few hundred bytes per
    document instead of the text — and each incoming batch is deduped
    against it without ever rescanning the corpus (write it partitioned/
    bucketed by a band key so the per-band candidate joins co-locate).
    """
    # guide §2.5: signature hashing is the per-row hot loop; a 1-split
    # source serializes it (identity at scale)
    d = (with_words(ensure_min_parallelism(df), text_col)
         .select(F.col(id_col), F.expr("array_distinct(words)").alias("ws")))
    d = _with_hws(d, method)
    sig_cols = [F.expr(e).alias(f"m{i}")
                for i, e in enumerate(_sig_exprs(k, method))]
    d = d.select(
        id_col, F.expr(_wh_expr(method)).alias("wh"), *sig_cols)
    band_cols = [F.expr(kx).alias(f"bk{b}")
                 for b, kx in enumerate(_band_key_exprs(k, band_rows,
                                                        method))]
    return d.select(id_col, F.expr("size(wh)").alias("nw"), "wh", *band_cols,
                    F.lit(_INDEX_FORMATS[method]).alias("fmt"))


def write_minhash_index(index_df: DataFrame, path: str,
                        table: str | None = None,
                        buckets: int = 32) -> str:
    """Persist a :func:`minhash_index` frame the way its docstring
    prescribes: BUCKETED BY the first band key, so each per-band
    candidate equi-join in :func:`lsh_incremental_pairs` co-locates
    with a bucket-pruned scan instead of shuffling the whole corpus
    index per ingest.

    Spark's bucketed writes go through the catalog (``saveAsTable`` —
    a plain ``parquet(path)`` cannot record bucket metadata), so the
    index is written as a table named ``table`` (default: derived from
    the path) with ``path`` as its location.  Returns the table name;
    read it back with ``spark.table(name)`` — scans and joins then see
    the bucketing (no Exchange on the bk0 side at join time when the
    join key includes bk0 and bucket counts line up).

    At 100 TB: ``buckets`` should scale with corpus size (a few hundred
    MB of index rows per bucket); re-bucketing happens only on index
    REWRITE, which a production pipeline does rarely (the incremental
    path appends survivors' index rows per ingest)."""
    name = table or ("idx_" + "".join(
        ch if ch.isalnum() else "_" for ch in path.strip("/").rsplit("/", 1)[-1]))
    (index_df.write.mode("overwrite")
     .option("path", path)
     .bucketBy(buckets, "bk0")
     .sortBy("bk0")
     .format("parquet")
     .saveAsTable(name))
    return name


def lsh_incremental_pairs(index_df: DataFrame, new_df: DataFrame | None,
                          id_col: str, text_col: str = "text",
                          k: int = 8, band_rows: int = 4,
                          threshold: float = 0.8,
                          method: str = "md5",
                          new_index_df: DataFrame | None = None) -> DataFrame:
    """Incremental MinHash+LSH dedup: an incoming batch against a
    PERSISTED corpus index (:func:`minhash_index`) — the shape a
    training-data pipeline runs per ingest, where re-deduping the full
    corpus per batch would be quadratic over the pipeline's lifetime.

    Returns ``(old_id, new_id, jaccard)`` for cross pairs with exact
    Jaccard >= threshold that share at least one LSH band.

    ``new_df`` is the incoming batch TEXT; callers that already hold
    ``minhash_index(new_df)`` (e.g. a survivors pass that also appends
    the index rows) pass it as ``new_index_df`` instead, so the batch
    signatures are computed ONCE across the composed plan.

    SCOPE — intra-batch near-duplicates: this function emits OLD-vs-NEW
    pairs only.  Two mutually-near-duplicate documents arriving in the
    SAME batch produce no pair here (neither is in the corpus index
    yet); an ingest decision that must also collapse those composes
    :func:`minhash_lsh_pairs` over the (small) batch — see
    ``queries/llm.py:dedup_incremental_intra_batch`` — or
    :func:`exact_dedup_groups` for exact-duplicate mass.

    Scale design (100 TB corpus, GB-scale daily batch):
    - the corpus side is the index, never the text: band keys + compact
      word-hash sets, read from the store already bucketed
      (:func:`write_minhash_index`);
    - candidates come from per-band equi-joins (new side tiny → AQE
      broadcasts it); the first-matching-band rule makes the band union
      duplicate-free by construction, so there is no distinct() over
      the candidate set (same construction as the full pipeline);
    - verification is exact Jaccard on the index's word-hash sets with
      the size prefilter — only candidate rows ever materialize.
    """
    n_bands = k // band_rows
    if (new_df is None) == (new_index_df is None):
        raise ValueError("pass exactly one of new_df / new_index_df")
    # format gate: the persisted index outlives the code that wrote it;
    # a marker mismatch means its band keys were produced by DIFFERENT
    # formulas than the batch's — the join would "work" and return
    # ~zero pairs (silent recall collapse), so refuse loudly instead.
    for label, frame in (("index_df", index_df),
                         ("new_index_df", new_index_df)):
        if frame is not None:
            _check_index_format(label, frame, _INDEX_FORMATS[method])
    new_idx = (new_index_df if new_index_df is not None
               else minhash_index(new_df, id_col, text_col, k, band_rows,
                                  method).localCheckpoint(eager=False))
    slim_o = index_df.select(F.col(id_col).alias("old_id"),
                             *[f"bk{b}" for b in range(n_bands)])
    slim_n = new_idx.select(F.col(id_col).alias("new_id"),
                            *[f"bk{b}" for b in range(n_bands)])
    parts = []
    for b in range(n_bands):
        o = slim_o.alias("o")
        nn = slim_n.alias("n")
        cond = F.col(f"o.bk{b}") == F.col(f"n.bk{b}")
        for j in range(b):
            # null-safe: an earlier null band key never matched, so it
            # must not suppress emission here (first-matching-band rule)
            cond = cond & ~F.col(f"o.bk{j}").eqNullSafe(F.col(f"n.bk{j}"))
        parts.append(o.join(nn, cond).select("old_id", "new_id"))
    cand = parts[0]
    for p in parts[1:]:
        cand = cand.unionByName(p)

    wh_o = index_df.select(F.col(id_col).alias("old_id"),
                           F.col("wh").alias("wh_o"),
                           F.col("nw").alias("nw_o"))
    wh_n = new_idx.select(F.col(id_col).alias("new_id"),
                          F.col("wh").alias("wh_n"),
                          F.col("nw").alias("nw_n"))
    # same verify construction as minhash_lsh_pairs: exact size-ratio
    # prefilter, then a rand()*0 optimization barrier so the jaccard
    # filter is not pushed into the join (array_intersect would run
    # twice per pair)
    return (cand.join(wh_o, "old_id").join(wh_n, "new_id")
            .filter(f"least(nw_o, nw_n) >= {threshold} * greatest(nw_o, nw_n)")
            .select("old_id", "new_id",
                    F.expr("size(array_intersect(wh_o, wh_n)) "
                           "+ cast(rand()*0 as int)").alias("ni"),
                    F.expr("nw_o + nw_n").alias("ns"))
            .withColumn("jaccard",
                        F.expr("round(ni / cast(ns - ni as double), 6)"))
            .filter(F.col("jaccard") >= threshold)
            .select("old_id", "new_id", "jaccard"))


def simhash(df: DataFrame, id_col: str, text_col: str = "text",
            bits: int = 32) -> DataFrame:
    """SimHash fingerprint over distinct words: bit b is set when more than
    half the word-hashes have bit b set.  Pure per-row expression."""
    d = with_words(df, text_col).withColumn("ws", F.expr("array_distinct(words)"))
    d = d.withColumn("hs", F.expr(f"transform(ws, w -> {hash64_expr('w')})"))
    bit_sum = (f"aggregate(sequence(0, {bits - 1}), 0L, (acc, b) -> acc + "
               "CASE WHEN size(filter(hs, h -> (h div shiftleft(1L, b)) % 2 = 1)) * 2 > size(hs) "
               "THEN shiftleft(1L, b) ELSE 0L END)")
    return d.select(F.col(id_col), F.expr(bit_sum).alias("simhash"))


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str = "text",
                        n: int = 2, threshold: float = 0.2,
                        id_limit: int | None = None) -> DataFrame:
    """Word n-gram Jaccard similarity over all pairs of a (small) subset —
    the exact quadratic baseline the LSH path approximates.  ``id_limit``
    bounds the subset; at scale use minhash_lsh_pairs instead."""
    d = with_words(df, text_col)
    if id_limit is not None:
        d = d.filter(F.col(id_col) < id_limit)
    if n == 1:
        grams = "array_distinct(words)"
    else:
        grams = (f"array_distinct(transform(sequence(0, size(words) - {n}), "
                 f"i -> concat_ws(' ', slice(words, i + 1, {n}))))")
    d = (d.filter(F.expr(f"size(words) >= {n}"))
          .select(F.col(id_col), F.expr(grams).alias("gs")))
    a = d.alias("a")
    b = d.alias("b")
    pairs = a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    jac = F.expr("round(size(array_intersect(a.gs, b.gs)) / "
                 "cast(size(array_distinct(concat(a.gs, b.gs))) as double), 6)")
    return (pairs.select(F.col(f"a.{id_col}").alias("id_a"),
                         F.col(f"b.{id_col}").alias("id_b"),
                         jac.alias("jaccard"))
                 .filter(F.col("jaccard") >= threshold))


def dedup_clusters(pairs: DataFrame, id_a: str = "id_a",
                   id_b: str = "id_b") -> DataFrame:
    """Collapse duplicate PAIRS into duplicate CLUSTERS: treat pairs as
    undirected edges and assign every document the minimum doc id
    reachable from it (connected components), plus the cluster size.

    This is the step after candidate verification in a real dedup
    pipeline — "A~B, B~C" must collapse into one keep-one-of-three
    cluster even though (A, C) was never emitted as a pair.  Reuses the
    pointer-doubling connected-components operator (O(log diameter)
    label-vector shuffles; dup-cluster diameters are tiny, so this
    converges in 2-3 rounds at any corpus size).  Returns
    (doc_id, cluster_id, cluster_size) for documents that belong to a
    cluster of size >= 2; singletons carry no dedup decision.
    """
    from flink_release_1_10_0_spark.operators.graph import connected_components
    comp = connected_components(pairs.select(id_a, id_b),
                                src=id_a, dst=id_b)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (comp.join(sizes, "component")
            .select(F.col("id").alias("doc_id"),
                    F.col("component").alias("cluster_id"),
                    "cluster_size"))


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicates: sign-random-projection (SRP) LSH
# ---------------------------------------------------------------------------

def srp_center_stats(df: DataFrame, vec_col: str = "embedding",
                     dim: int = 64, scale: int = 1000) -> DataFrame:
    """Per-dimension BIGINT sums + row count of the quantized corpus —
    the SRP centroid statistics (one broadcastable row: __qs, __n).
    Part of the persisted index's metadata contract: incremental
    ingests project new batches against the INDEX's centroid."""
    qv = (f"transform(slice({vec_col}, 1, {dim}), "
          f"x -> CAST(FLOOR(CAST(x AS DOUBLE) * {scale}) AS BIGINT))")
    return (df.select(F.posexplode(F.expr(qv)).alias("pos", "v"))
            .groupBy("pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .agg(F.expr("transform(array_sort(collect_list("
                        "struct(pos, s))), x -> x.s)").alias("__qs"),
                 F.max("n").alias("__n")))

def srp_signatures(df: DataFrame, id_col: str = "vec_id",
                   vec_col: str = "embedding", dim: int = 64,
                   planes_per_band: int = 4, n_bands: int = 4,
                   scale: int = 1000, center: bool = True,
                   stats: DataFrame | None = None) -> DataFrame:
    """Sign-random-projection band keys for cosine LSH (Charikar's SimHash
    for real vectors).  Plane ``j``'s hyperplane is the deterministic
    ±1 vector ``sign(Knuth_hash(j*dim + i))``; bit ``j`` of a signature is
    set when the projection of the (integer-quantized, MEAN-CENTERED)
    vector onto that plane is non-negative.

    Centering (``center=True``, the default): hyperplanes through the
    ORIGIN split real embedding corpora badly — measured on the synthetic
    embeddings, every plane split ~20/80, so a 14-bit key had ~10 bits of
    entropy and the 100x tier's hot buckets exploded the candidate join
    (filled the disk).  Projecting ``x - mean(corpus)`` restores ~50/50
    per plane.  Implementation keeps the INTEGER-exact contract by
    multiplying through by the corpus count: ``sign(dot(s, q*N - S))``
    where ``q = floor(x*scale)``, ``S`` = per-dimension BIGINT sum of q,
    ``N`` = corpus count — pure BIGINT, safe to ~1e12 rows at |q|<=2000
    (max |q*N| * dim ~ 1.3e17 < 2^63).  Cosine verification downstream is
    unaffected (it uses the RAW vectors).

    Determinism contract: components are quantized with
    ``floor(x * scale)`` (exact in any engine) and the projection is pure
    BIGINT arithmetic, so the signatures — unlike float dot products,
    whose summation order varies per engine — are bit-identical between
    Spark and any oracle that replays the same integers.

    Scale shape: one (pos)-keyed aggregation for the centroid sums (a
    64-row broadcast) + one map-only projection pass; the band key is the
    join/shuffle key downstream, so candidate generation is a per-band
    equi-join exactly like the MinHash LSH path above.
    """
    # guide §2.5: the projection (n_bands*planes 64-dim BIGINT dots per
    # row) is the op's hot loop; a 1-split scan runs it serially
    # (identity at scale, and when the caller already rebalanced)
    df = ensure_min_parallelism(df)
    qv = (f"transform(slice({vec_col}, 1, {dim}), "
          f"x -> CAST(FLOOR(CAST(x AS DOUBLE) * {scale}) AS BIGINT))")
    d = df.withColumn("__qv", F.expr(qv))
    if center:
        # stats may be precomputed (srp_center_stats) — the incremental
        # ingest path MUST center new batches on the INDEX's centroid,
        # never the batch's own, or band keys stop aligning
        if stats is None:
            stats = srp_center_stats(df, vec_col, dim, scale)
        d = d.crossJoin(F.broadcast(stats))
        comp = ("(element_at(__qv, i + 1) * __n "
                "- element_at(__qs, i + 1))")
    else:
        comp = "element_at(__qv, i + 1)"
    dot = (f"aggregate(sequence(0, {dim - 1}), 0L, (a, i) -> a + "
           f"CASE WHEN pmod((j * {dim} + i + 1) * 2654435761L, 4294967296L) "
           f"< 2147483648L THEN {comp} "
           f"ELSE -{comp} END)")
    cols = [F.col(id_col)]
    for b in range(n_bands):
        lo = b * planes_per_band
        hi = lo + planes_per_band - 1
        band = (f"aggregate(sequence({lo}, {hi}), 0L, (acc, j) -> acc + "
                f"IF(({dot}) >= 0, shiftleft(1L, j - {lo}), 0L))")
        cols.append(F.expr(band).alias(f"sk{b}"))
    return d.select(*cols)


def _verify_side_broadcastable(df: DataFrame,
                               limit_bytes: int) -> bool:
    """Catalyst's optimized-plan size estimate for the verify-side vector
    table vs a byte threshold.  No job runs — this reads the same
    statistics Catalyst itself uses for autoBroadcastJoinThreshold, so a
    parquet-backed corpus is judged by its file footprint.  Unknown /
    unreachable stats fall back to broadcastable=True — and "unknown"
    includes Catalyst's MISSING-stats sentinel: leaf nodes with no
    estimate (LogicalRDD, post-Python-UDF plans) report
    spark.sql.defaultSizeInBytes = Long.MaxValue, which must read as
    "no information" rather than "too big", or a small in-memory corpus
    would silently lose the broadcast and spill (the measured 100x-tier
    failure the broadcast exists to prevent).  Callers with a genuinely
    huge statless frame pass broadcast_verify=False explicitly."""
    try:
        sz = int(str(df._jdf.queryExecution().optimizedPlan()
                     .stats().sizeInBytes()))
        if sz >= (1 << 62):        # defaultSizeInBytes sentinel: unknown
            return True
        return 0 <= sz <= limit_bytes
    except Exception:
        return True


def _vec_side(df: DataFrame, id_col: str, vec_col: str,
              out_id: str, suffix: str) -> DataFrame:
    """(id, vector, L2 norm) projection for one side of a cosine verify —
    norms computed ONCE per vector, never per candidate pair."""
    nrm = (f"sqrt(aggregate({vec_col}, 0D, (s, x) -> s + "
           "CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))")
    return df.select(F.col(id_col).alias(out_id),
                     F.col(vec_col).alias(f"__v{suffix}"),
                     F.expr(nrm).alias(f"__n{suffix}"))


def _attach_cosine(cand: DataFrame, va: DataFrame, vb: DataFrame,
                   a_col: str, b_col: str, threshold: float,
                   hint_a, hint_b) -> DataFrame:
    """Shared exact-cosine verify stage: attach both vector sides to the
    candidate pairs (each through its caller-chosen broadcast hint),
    one zip_with dot product per pair, threshold filter.  va/vb carry
    (a_col|b_col, __va|__vb, __na|__nb) — from :func:`_vec_side` or an
    index's precomputed columns.  Every pair-emitting dedup op
    (SRP full/incremental, SemDeDup) verifies through this one block so
    the cosine expression and broadcast policy can never diverge."""
    dotsum = ("aggregate(zip_with(__va, __vb, (x, y) -> "
              "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (s, v) -> s + v)")
    cos = f"round(({dotsum}) / (__na * __nb), 6)"
    return (cand.join(hint_a(va), a_col)
            .join(hint_b(vb), b_col)
            .withColumn("cosine", F.expr(cos))
            .filter(F.col("cosine") >= threshold)
            .select(a_col, b_col, "cosine"))


def embedding_srp_pairs(df: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding", dim: int = 64,
                        planes_per_band: int = 4, n_bands: int = 4,
                        threshold: float = 0.35,
                        stats: DataFrame | None = None,
                        broadcast_verify: bool | None = None,
                        broadcast_limit_bytes: int = 1 << 30) -> DataFrame:
    """Embedding near-duplicate pairs: SRP band buckets propose candidate
    pairs (per-band equi-self-join, first-matching-band rule so a pair
    sharing several bands is emitted once), exact cosine over the original
    float vectors verifies them.  Returns (id_a, id_b, cosine),
    cosine >= threshold, id_a < id_b.

    100 TB design: candidates come only from band-key equi-joins (shuffle
    on the 2^planes-bucket key per band — no cross join anywhere); the
    quadratic cosine verify runs per candidate pair, and band geometry
    (planes_per_band) controls the bucket collision rate exactly like
    band_rows in the MinHash path.  For recall-critical jobs lower
    planes_per_band / raise n_bands — cost scales linearly in bands.
    """
    # guide §2.5: the SRP projection (16 64-dim BIGINT dots per row) is
    # the op's per-row hot loop; a 1-split scan runs it serially
    df = ensure_min_parallelism(df)
    sig = srp_signatures(df, id_col, vec_col, dim,
                         planes_per_band, n_bands,
                         stats=stats).localCheckpoint(eager=False)
    parts = []
    for b in range(n_bands):
        a = sig.alias("a")
        c = sig.alias("c")
        cond = ((F.col(f"a.sk{b}") == F.col(f"c.sk{b}"))
                & (F.col(f"a.{id_col}") < F.col(f"c.{id_col}")))
        for j in range(b):
            cond = cond & (F.col(f"a.sk{j}") != F.col(f"c.sk{j}"))
        parts.append(a.join(c, cond).select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"c.{id_col}").alias("id_b")))
    cand = parts[0]
    for p in parts[1:]:
        cand = cand.unionByName(p)

    # norms precomputed ONCE per vector (not per candidate pair — at k
    # candidates per doc that's a k-fold saving on the verify stage);
    # the per-pair work is a single zip_with dot product.  The vector
    # table is BROADCAST when it fits: the candidate stream can be
    # orders of magnitude larger than the corpus (clustered corpora put
    # whole clusters in one bucket), and sort-merge-joining 10^8 slim
    # pairs against a few-hundred-MB vector side spills catastrophically
    # — measured on the 100x tier (the run filled the disk).  But the
    # broadcast is ITSELF the OOM once the corpus outgrows executor
    # memory, so it is size-gated: above ``broadcast_limit_bytes``
    # (Catalyst's plan-size estimate; override with
    # ``broadcast_verify=True/False``) the verify falls back to plain
    # shuffle joins — AQE picks shuffled-hash / skew-splits them, and a
    # corpus persisted via :func:`write_srp_index` co-locates on its
    # bucketing.  Both branches are plan-gated in tests/test_plans.py.
    if broadcast_verify is None:
        broadcast_verify = _verify_side_broadcastable(
            df.select(id_col, vec_col), broadcast_limit_bytes)
    hint = F.broadcast if broadcast_verify else (lambda d: d)
    return _attach_cosine(cand,
                          _vec_side(df, id_col, vec_col, "id_a", "a"),
                          _vec_side(df, id_col, vec_col, "id_b", "b"),
                          "id_a", "id_b", threshold, hint, hint)


def embedding_cosine_pairs_exact(df: DataFrame, id_col: str = "vec_id",
                                 vec_col: str = "embedding", dim: int = 64,
                                 threshold: float = 0.35,
                                 id_limit: int | None = None) -> DataFrame:
    """Exact quadratic cosine near-dup baseline (the recall yardstick for
    ``embedding_srp_pairs``).  ``id_limit`` fences the O(n^2) pair space —
    REQUIRED at scale, same contract as ngram_jaccard_pairs."""
    if id_limit is not None:
        df = df.filter(F.col(id_col) < id_limit)
    nrm = ("sqrt(aggregate({v}, 0D, (s, x) -> s + "
           "CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))")
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"),
                  F.expr(nrm.format(v=vec_col)).alias("__na"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"),
                  F.expr(nrm.format(v=vec_col)).alias("__nb"))
    dotsum = ("aggregate(zip_with(__va, __vb, (x, y) -> "
              "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (s, v) -> s + v)")
    cos = f"round(({dotsum}) / (__na * __nb), 6)"
    return (a.join(b, F.col("id_a") < F.col("id_b"))
            .withColumn("cosine", F.expr(cos))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


def srp_index(df: DataFrame, id_col: str = "vec_id",
              vec_col: str = "embedding", dim: int = 64,
              planes_per_band: int = 4, n_bands: int = 4,
              stats: DataFrame | None = None) -> DataFrame:
    """Persisted SRP index artifact: (id, band keys, norm, vector).

    The embedding-side mirror of :func:`minhash_index` — a few hundred
    bytes per document (band keys + norm + the original vector, which the
    exact-cosine verify stage needs, exactly as the MinHash index carries
    word-hashes for its Jaccard verify).  Write it partitioned/bucketed by
    a band key so incremental ingests prune at the file level.  The
    corpus centroid statistics (``srp_center_stats``) are index METADATA:
    persist them alongside the rows and pass them as ``stats`` when
    signing incoming batches — signatures centered on a different
    centroid do not share band keys."""
    # guide §2.5: rebalance ONCE here so the signature pass, the norm
    # projection and the id-join below all parallelize from a narrow
    # scan (identity at scale)
    df = ensure_min_parallelism(df)
    nrm = (f"sqrt(aggregate({vec_col}, 0D, (s, x) -> s + "
           "CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))")
    sig = srp_signatures(df, id_col, vec_col, dim, planes_per_band,
                         n_bands, stats=stats)
    keep = df.select(F.col(id_col), F.col(vec_col).alias("__vec"),
                     F.expr(nrm).alias("__norm"))
    return sig.join(keep, id_col).withColumn("fmt", F.lit(_SRP_FORMAT))


def srp_incremental_pairs(index_df: DataFrame, new_df: DataFrame,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding", dim: int = 64,
                          planes_per_band: int = 4, n_bands: int = 4,
                          threshold: float = 0.35,
                          stats: DataFrame | None = None,
                          broadcast_verify: bool | None = None,
                          broadcast_limit_bytes: int = 1 << 30) -> DataFrame:
    """Near-duplicate pairs between a persisted corpus index and an
    incoming batch: per-band equi-joins (batch side broadcastable — the
    corpus is NEVER rescanned beyond the band-key joins),
    first-matching-band single emission, exact cosine against the
    index-carried vectors.  Returns (old_id, new_id, cosine).

    The embedding mirror of :func:`lsh_incremental_pairs`: at 100 TB the
    index is the only large side, its band-key bucketing keeps each join
    shuffle-free on the corpus, and the batch recomputes only its own
    signatures.  Intra-batch near-dups are NOT emitted here — compose
    :func:`embedding_srp_pairs` over the (small) batch first, the same
    ingest decision as the MinHash path."""
    # sign the batch against the INDEX's centroid: ``stats`` is the
    # persisted centroid frame from :func:`read_srp_index` — the
    # production path, no corpus scan.  Only when no stats frame is
    # supplied (ad-hoc in-memory index) is the centroid re-derived from
    # the index-carried vectors; an index grown by appended batches MUST
    # pass the ORIGINAL persisted stats, or the re-derived centroid
    # drifts and new-batch band keys stop aligning with stored keys.
    _check_index_format("index_df", index_df, _SRP_FORMAT)
    if stats is None:
        stats = srp_center_stats(
            index_df.select(F.col("__vec").alias(vec_col)), vec_col, dim)
    new_idx = srp_index(new_df, id_col, vec_col, dim,
                        planes_per_band, n_bands,
                        stats=stats).localCheckpoint(eager=False)
    # candidates over SLIM (id, band keys) projections only; the vectors
    # attach ONCE after the union — same order-of-operations as the
    # MinHash path, so the 4-band joins never shuffle the payload
    slim_o = index_df.select(F.col(id_col).alias("old_id"),
                             *[f"sk{b}" for b in range(n_bands)])
    slim_n = new_idx.select(F.col(id_col).alias("new_id"),
                            *[f"sk{b}" for b in range(n_bands)])
    parts = []
    for b in range(n_bands):
        o = slim_o.alias("o")
        nn = slim_n.alias("n")
        cond = F.col(f"o.sk{b}") == F.col(f"n.sk{b}")
        for j in range(b):
            cond = cond & (F.col(f"o.sk{j}") != F.col(f"n.sk{j}"))
        parts.append(o.join(nn, cond).select("old_id", "new_id"))
    cand = parts[0]
    for p in parts[1:]:
        cand = cand.unionByName(p)
    # index-carried vectors + norms (no recompute): both sides already
    # hold (__vec, __norm).  Vector attaches follow the same size-gated
    # broadcast policy as embedding_srp_pairs (see its verify-stage
    # note): the INDEX side is the unbounded one, so only its estimate
    # drives the auto decision — the new batch stays broadcast
    # (per-ingest batches are small by the incremental contract).  A
    # bucketed write_srp_index corpus co-locates the fallback join on sk0.
    va = index_df.select(F.col(id_col).alias("old_id"),
                         F.col("__vec").alias("__va"),
                         F.col("__norm").alias("__na"))
    vb = new_idx.select(F.col(id_col).alias("new_id"),
                        F.col("__vec").alias("__vb"),
                        F.col("__norm").alias("__nb"))
    if broadcast_verify is None:
        broadcast_verify = _verify_side_broadcastable(
            index_df.select(id_col, "__vec", "__norm"),
            broadcast_limit_bytes)
    hint = F.broadcast if broadcast_verify else (lambda d: d)
    return _attach_cosine(cand, va, vb, "old_id", "new_id", threshold,
                          hint, F.broadcast)


def scrub_duplicate_spans(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", n: int = 8) -> DataFrame:
    """Exact duplicate-span scrub (Lee et al. 2022, arXiv:2107.06499,
    "Deduplicating Training Data Makes Language Models Better" — their
    ExactSubstr variant, token-window granularity): every n-token span
    occurring in MORE THAN ONE document is removed from every document
    except the span's single global first occurrence (minimum
    (doc_id, position)); surviving tokens reassemble in order.  Spans
    repeated only WITHIN one document are kept (that is the repetition
    signal text_repetition_stats measures, not cross-corpus leakage).
    Returns (id, total_tokens, kept_tokens, scrubbed_text); documents
    shorter than n tokens pass through untouched.

    100 TB design: rolling spans are a map-side transform per document;
    the duplicate-span table is one groupBy on the span (at real scale
    key by xxhash64(span) — the string key here keeps the SQL oracle
    exact), keepers are a min(struct) aggregate (no window), coverage
    is a bounded n-row explode per scrubbed occurrence, and the kill is
    a (doc, token-index) anti-join — equi-joins and aggregations only,
    output linear in corpus size.  Same reassembly contract as the
    segment-boilerplate scrub (array_sort(collect_list) per document).
    """
    from flink_release_1_10_0_spark.llm.text import words_expr

    d = df.select(id_col, F.expr(words_expr(text_col)).alias("__ws"))
    # sequence(1, size-n+1) counts DOWN for size < n (the winnowing
    # lesson) — span generation is gated on size >= n; short docs still
    # flow through tokens/reassembly below and survive whole
    grams = (d.filter(F.size("__ws") >= n)
             .select(id_col, F.posexplode(F.expr(
                 f"transform(sequence(1, size(__ws) - {n - 1}), "
                 f"i -> array_join(slice(__ws, i, {n}), ' '))"))
                 .alias("__p0", "gram"))
             .select(id_col, (F.col("__p0") + 1).alias("pos"), "gram"))
    dup = (grams.groupBy("gram")
           .agg(F.min(F.struct(F.col(id_col).alias("d"),
                               F.col("pos").alias("p"))).alias("keeper"),
                F.countDistinct(id_col).alias("__nd"))
           .filter(F.col("__nd") >= 2)
           .select("gram", "keeper"))
    scrub = (grams.join(dup, "gram")
             .filter(~((F.col(id_col) == F.col("keeper.d"))
                       & (F.col("pos") == F.col("keeper.p"))))
             .select(id_col, "pos"))
    covered = (scrub.select(
        id_col, F.explode(F.expr(f"sequence(pos, pos + {n - 1})"))
        .alias("i")).distinct())
    toks = (d.select(id_col, F.posexplode("__ws").alias("__i0", "w"))
            .select(id_col, (F.col("__i0") + 1).alias("i"), "w"))
    surv = toks.join(covered, [id_col, "i"], "left_anti")
    kept = (surv.groupBy(id_col)
            .agg(F.count("*").alias("kept_tokens"),
                 F.expr("array_join(transform(array_sort("
                        "collect_list(struct(i, w))), x -> x.w), ' ')")
                 .alias("scrubbed_text")))
    return (d.select(id_col, F.size("__ws").cast("bigint")
                     .alias("total_tokens"))
            .join(kept, id_col, "left")
            .select(id_col, "total_tokens",
                    F.coalesce(F.col("kept_tokens"), F.lit(0))
                    .cast("bigint").alias("kept_tokens"),
                    F.coalesce(F.col("scrubbed_text"), F.lit(""))
                    .alias("scrubbed_text")))


def _semantic_k(df: DataFrame, k: int | None,
                target_cluster_size: int | None) -> int:
    """Resolve the SemDeDup cluster count: exactly one of k /
    target_cluster_size; neither given defaults to the scale-safe
    derived-k geometry (target=250 — SemDeDup's own ~50k-over-LAION
    shape; the 100x sweep measured fixed-k super-linear at 64.5x vs
    ~linear 20.4x for this lever)."""
    if k is not None and target_cluster_size is not None:
        raise ValueError("pass exactly one of k / target_cluster_size "
                         "(fixed cluster count vs the scale-invariant "
                         "per-cluster size)")
    if k is None and target_cluster_size is None:
        target_cluster_size = 250  # scale-safe default geometry
    if k is None:
        # one scalar action at plan-build time (the same pattern as the
        # CC convergence probe) — the codebook size must be a literal
        # before Lloyd's runs
        n = df.count()
        k = max(1, -(-n // target_cluster_size))
    return k


def semantic_dedup_pairs(df: DataFrame, id_col: str = "vec_id",
                         vec_col: str = "embedding", k: int | None = None,
                         iterations: int = 2,
                         threshold: float = 0.35,
                         target_cluster_size: int | None = None,
                         broadcast_verify: bool | None = None,
                         broadcast_limit_bytes: int = 1 << 30) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023,
    arXiv:2303.09540): k-means clusters prune the pair space, exact
    cosine runs only WITHIN each cluster.  Returns (id_a, id_b, cosine),
    cosine >= threshold, id_a < id_b, both in the same cluster.

    The deterministic k-means contract is llm/similarity's (smallest-k
    init, lexicographic tie-break, DECIMAL mean updates), so a SQL
    oracle replays the clustering bit-for-bit.

    100 TB design: Lloyd's is one broadcast-codebook map pass + one
    shuffle per iteration; candidate pairs are a cid-keyed equi-self-
    join, never all-pairs — the pair space is sum(|c|^2)/2 over
    clusters, controlled by k.  A FIXED k lets clusters (and the
    quadratic within-cluster term) grow with the corpus — the 100x
    sweep measured fixed-k at 64.5x vs ~linear (20.4x) for the
    derived-k shape — so the DEFAULT is the scale-invariant lever:
    ``target_cluster_size=250`` (SemDeDup's own ~50k-clusters-over-LAION
    geometry), k derived as ceil(n / target) from one count, pair space
    ~n * target/2 at any corpus size.  Pass a fixed ``k`` only when you
    know the corpus is small and want the exact cluster count (the
    sf0.01 oracles do this for bit-replayable codebooks); passing both
    refuses loudly.  The vector attach reuses the size-gated broadcast
    policy of :func:`embedding_srp_pairs` (broadcast under the limit,
    shuffle join above it)."""
    from flink_release_1_10_0_spark.llm.similarity import (
        kmeans_assign, kmeans_train)

    k = _semantic_k(df, k, target_cluster_size)
    # guide §2.5: Lloyd's assignment and the within-cluster cosine verify
    # are broadcast-side map passes — their parallelism IS the corpus
    # scan's split count, so a 1-split source serializes them
    df = ensure_min_parallelism(df)
    cents = kmeans_train(df, k=k, iterations=iterations,
                         id_col=id_col, vec_col=vec_col)
    asg = (kmeans_assign(df, cents, id_col=id_col, vec_col=vec_col)
           .select(id_col, "cid").localCheckpoint(eager=False))
    a = asg.select(F.col(id_col).alias("id_a"), "cid")
    b = asg.select(F.col(id_col).alias("id_b"), "cid")
    cand = (a.join(b, "cid")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b"))
    if broadcast_verify is None:
        broadcast_verify = _verify_side_broadcastable(
            df.select(id_col, vec_col), broadcast_limit_bytes)
    hint = F.broadcast if broadcast_verify else (lambda d: d)
    return _attach_cosine(cand,
                          _vec_side(df, id_col, vec_col, "id_a", "a"),
                          _vec_side(df, id_col, vec_col, "id_b", "b"),
                          "id_a", "id_b", threshold, hint, hint)


def semantic_index(df: DataFrame, id_col: str = "vec_id",
                   vec_col: str = "embedding", k: int | None = None,
                   iterations: int = 2,
                   target_cluster_size: int | None = None
                   ) -> tuple[DataFrame, DataFrame]:
    """The persistable SemDeDup artifact pair: (index rows, centroids).

    Index rows are ``(id, cid, __vec, __norm)`` — cluster assignment plus
    the raw vector and its L2 norm, everything the within-cluster exact-
    cosine verify needs, so an incremental ingest NEVER rescans the
    corpus (the semantic mirror of :func:`srp_index` / :func:`minhash_index`).
    The centroid frame ``(cid, cvec)`` is index METADATA, exactly like
    SRP's centering stats: new batches MUST be assigned against these
    persisted centroids, never a re-trained codebook, or cluster ids
    stop aligning with stored rows.  Same k / target_cluster_size
    contract (and scale-safe default) as :func:`semantic_dedup_pairs`."""
    from flink_release_1_10_0_spark.llm.similarity import (
        kmeans_assign, kmeans_train)

    k = _semantic_k(df, k, target_cluster_size)
    df = ensure_min_parallelism(df)  # same rationale as semantic_dedup_pairs
    cents = kmeans_train(df, k=k, iterations=iterations,
                         id_col=id_col, vec_col=vec_col)
    nrm = (f"sqrt(aggregate({vec_col}, 0D, (s, x) -> s + "
           "CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))")
    rows = (kmeans_assign(df, cents, id_col=id_col, vec_col=vec_col)
            .select(id_col, "cid", F.col(vec_col).alias("__vec"),
                    F.expr(nrm).alias("__norm"),
                    F.lit(_SEMANTIC_FORMAT).alias("fmt")))
    return rows, cents


def write_semantic_index(index_df: DataFrame, cents: DataFrame, path: str,
                         table: str | None = None,
                         buckets: int = 32) -> str:
    """Persist a :func:`semantic_index`: rows BUCKETED BY ``cid`` (the
    only join key the incremental path uses, so per-ingest candidate
    joins co-locate with a bucket-pruned scan), centroids as a
    ``_``-prefixed parquet sidecar (KBs — invisible to parquet
    discovery, the same layout as ivf_build_index's ``_centroids``).

    Same catalog mechanics as :func:`write_minhash_index` (bucketed
    writes go through ``saveAsTable``).  Returns the table name; read
    back with :func:`read_semantic_index`."""
    name = table or ("semidx_" + "".join(
        ch if ch.isalnum() else "_" for ch in path.strip("/").rsplit("/", 1)[-1]))
    (index_df.write.mode("overwrite")
     .option("path", path)
     .bucketBy(buckets, "cid")
     .sortBy("cid")
     .format("parquet")
     .saveAsTable(name))
    (cents.coalesce(1)
     .write.mode("overwrite").parquet(path + "/_centroids"))
    return name


def read_semantic_index(spark, path: str,
                        table: str) -> tuple[DataFrame, DataFrame]:
    """Load a persisted semantic index: (rows frame with live bucket
    metadata, persisted centroid frame for assigning new batches)."""
    return spark.table(table), spark.read.parquet(path + "/_centroids")


def semantic_incremental_pairs(index_df: DataFrame, cents: DataFrame,
                               new_df: DataFrame,
                               id_col: str = "vec_id",
                               vec_col: str = "embedding",
                               threshold: float = 0.35,
                               broadcast_verify: bool | None = None,
                               broadcast_limit_bytes: int = 1 << 30
                               ) -> DataFrame:
    """SemDeDup pairs between a persisted corpus index and an incoming
    batch: assign the batch against the PERSISTED centroids (one
    broadcast-codebook map pass — the corpus is never rescanned and the
    codebook is never retrained), join index rows on ``cid``, verify
    with exact cosine against the index-carried vectors.  Returns
    (old_id, new_id, cosine), cosine >= threshold.

    The semantic mirror of :func:`lsh_incremental_pairs` /
    :func:`srp_incremental_pairs`, same contracts: intra-batch pairs
    are NOT emitted here (compose :func:`semantic_dedup_pairs` over the
    small batch for those); the candidate join is cid-keyed — a
    :func:`write_semantic_index` corpus co-locates it bucket-pruned; the
    verify-side broadcast follows the shared size-gate policy (the
    index side is the unbounded one and drives the auto decision)."""
    from flink_release_1_10_0_spark.llm.similarity import kmeans_assign

    _check_index_format("index_df", index_df, _SEMANTIC_FORMAT)
    nrm = (f"sqrt(aggregate({vec_col}, 0D, (s, x) -> s + "
           "CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))")
    new_idx = (kmeans_assign(new_df, cents, id_col=id_col, vec_col=vec_col)
               .select(id_col, "cid", F.col(vec_col).alias("__vec"),
                       F.expr(nrm).alias("__norm"))
               .localCheckpoint(eager=False))
    cand = (index_df.select(F.col(id_col).alias("old_id"), "cid")
            .join(new_idx.select(F.col(id_col).alias("new_id"), "cid"),
                  "cid")
            .select("old_id", "new_id"))
    va = index_df.select(F.col(id_col).alias("old_id"),
                         F.col("__vec").alias("__va"),
                         F.col("__norm").alias("__na"))
    vb = new_idx.select(F.col(id_col).alias("new_id"),
                        F.col("__vec").alias("__vb"),
                        F.col("__norm").alias("__nb"))
    if broadcast_verify is None:
        broadcast_verify = _verify_side_broadcastable(
            va, broadcast_limit_bytes)
    hint_a = F.broadcast if broadcast_verify else (lambda d: d)
    return _attach_cosine(cand, va, F.broadcast(vb),
                          "old_id", "new_id", threshold,
                          hint_a, lambda d: d)


def semantic_batch_pairs(cents: DataFrame, new_df: DataFrame,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         threshold: float = 0.35) -> DataFrame:
    """Within-batch SemDeDup pairs under PERSISTED centroids: the batch
    is assigned to the index's codebook (never its own retrain — the
    ingest-decision contract), pairs are same-cid + exact cosine,
    id_a < id_b.  The intra-batch half of the full ingest decision;
    compose with :func:`semantic_incremental_pairs` for the cross
    half (see queries/llm.py:dedup_semantic_ingest_survivors)."""
    from flink_release_1_10_0_spark.llm.similarity import kmeans_assign

    asg = (kmeans_assign(new_df, cents, id_col=id_col, vec_col=vec_col)
           .select(id_col, "cid").localCheckpoint(eager=False))
    cand = (asg.select(F.col(id_col).alias("id_a"), "cid")
            .join(asg.select(F.col(id_col).alias("id_b"), "cid"), "cid")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b"))
    return _attach_cosine(
        cand,
        _vec_side(new_df, id_col, vec_col, "id_a", "a"),
        _vec_side(new_df, id_col, vec_col, "id_b", "b"),
        "id_a", "id_b", threshold, F.broadcast, F.broadcast)


def write_srp_index(index_df: DataFrame, stats: DataFrame, path: str,
                    table: str | None = None, buckets: int = 32) -> str:
    """Persist a :func:`srp_index` frame + its centroid statistics the
    way the index docstring prescribes: rows BUCKETED BY the first band
    key (each per-band candidate equi-join in
    :func:`srp_incremental_pairs` then co-locates with a bucket-pruned
    scan), centroid stats as a JSON sidecar — signatures for future
    ingests MUST come from this centroid, never the batch's own.

    Same catalog mechanics as :func:`write_minhash_index` (bucketed
    writes go through ``saveAsTable``).  Returns the table name; read
    back with :func:`read_srp_index`."""
    import json
    import os

    name = table or ("srpidx_" + "".join(
        ch if ch.isalnum() else "_" for ch in path.strip("/").rsplit("/", 1)[-1]))
    (index_df.write.mode("overwrite")
     .option("path", path)
     .bucketBy(buckets, "sk0")
     .sortBy("sk0")
     .format("parquet")
     .saveAsTable(name))
    row = stats.first()
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "_srp_centroid.json"), "w") as f:
        json.dump({"qs": list(row["__qs"]), "n": row["__n"]}, f)
    return name


def read_srp_index(spark, path: str, table: str):
    """Load a persisted SRP index: (rows frame with live bucket
    metadata, centroid stats frame for signing new batches)."""
    import json
    import os

    with open(os.path.join(path, "_srp_centroid.json")) as f:
        meta = json.load(f)
    stats = spark.createDataFrame(
        [(meta["qs"], meta["n"])], "__qs array<bigint>, __n bigint")
    return spark.table(table), stats
