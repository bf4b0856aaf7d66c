"""Large-scale training-data pipeline operators (driver mandate in
BASELINE.json, beyond the reference's own surface):

- ``text``: tokenization, quality scoring, language-ID, fingerprinting
- ``dedup``: exact, word-set, MinHash+LSH, SimHash, n-gram Jaccard
- ``similarity``: brute-force cosine top-k, IVF-style centroid search
- ``multimodal``: opaque-binary column plumbing with stubbed decoders

Everything is expressed with JVM-side higher-order functions
(``transform``/``filter``/``aggregate`` over arrays) — no Python UDFs in
the hot path — so the same plan scales to 100 TB: per-row array work is
embarrassingly parallel, and the only shuffles are the final
group-bys/joins on hashed keys (band buckets, fingerprints), which are
uniformly distributed by construction.
"""
