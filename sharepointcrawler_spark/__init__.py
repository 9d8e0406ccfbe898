"""sharepointcrawler_spark — a from-scratch PySpark-native crawl frontier,
fetch scheduler and text-extraction engine with the capabilities of
ksli78/SharePointCrawler (reference at /root/reference, read-only).

NOT a port: the reference's sequential C# async loop (SharePointClient.cs)
becomes partition-parallel DataFrame waves; its in-memory traversal state
becomes frontier/seen tables; its per-document extraction
(PdfToMarkdownConverter.cs) becomes vectorized Arrow/pandas UDFs.

Subpackages
-----------
functions   : scalar/vectorized column functions (urlnorm, text analysis)
operators   : frontier, dedup (exact + bloom/cuckoo), politeness, robots,
              corpus dedup (minhash/simhash/ngram/embedding), similarity,
              chunking, multimodal plumbing
extraction  : the byte-identity html->markdown converter + pandas UDFs
plans       : crawl wave loop, snapshot store (checkpoint/resume), metrics
sources     : deterministic synthetic pages / site-graph generators
streaming   : Structured Streaming incremental crawl mode
"""

__version__ = "0.1.0"
