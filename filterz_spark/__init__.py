"""filterz-spark: PySpark-native distributed sketch / approximate-membership library.

Brand-new implementation with the capabilities of steelcake/filterz (static
approximate-membership filters: split-block Bloom, xor/binary-fuse, ribbon)
generalized into Spark-first primitives, plus the mergeable sketch family
(HLL, count-min, t-digest, KLL, Bloom) required for web-scale distinct-count/
frequency/quantile estimation over Common-Crawl-style page tables.
"""

__version__ = "0.1.0"
