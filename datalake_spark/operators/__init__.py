"""Custom operators the reference lacks, composed Spark-first: dedup family
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
similarity search (brute-force + LSH ANN), as-of & range joins, multimodal
column plumbing."""
