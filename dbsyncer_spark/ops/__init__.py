"""Training-data pipeline operators (first-class engine components).

The reference's capability set ends at row sync + Lucene search; a
100 TB training-data pipeline additionally needs dedup, similarity
search, text analysis, and multimodal column plumbing. Everything here
is DataFrame-first (Catalyst-optimizable Column expressions); Python
appears only inside vectorized Arrow UDFs on clearly-marked scale paths.

- ``dedup``      : exact, n-gram Jaccard, MinHash+LSH, SimHash
- ``similarity`` : brute-force cosine top-k, LSH-bucketed ANN
- ``textstats``  : token counting, quality scoring, language-ID,
                   winnowing fingerprints
- ``multimodal`` : opaque binary columns + typed metadata, decode UDF
                   plumbing (decode itself stubbed — libs not present)
"""
