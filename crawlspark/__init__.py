"""crawlspark — a PySpark-native distributed URL-frontier / fetch-scheduler
analytics engine with the capabilities of crwlrsoft/crawler (reference at
/root/reference, studied for semantics only; architecture is Spark-first).

Subsystems
----------
- :mod:`crawlspark.session`     SparkSession factory tuned for the engine
- :mod:`crawlspark.canon`       URL canonicalization + xxhash64 fingerprinting
- :mod:`crawlspark.graph`       deterministic synthetic web graph (SQL-derivable)
- :mod:`crawlspark.frontier`    level-synchronous BFS crawl driver loop
- :mod:`crawlspark.politeness`  host-bucket priority queue + throttle schedule
- :mod:`crawlspark.robots`      robots.txt rules table + broadcast filter
- :mod:`crawlspark.seen`        URL-seen set (bloom prefilter + exact anti-join)
- :mod:`crawlspark.extract`     vectorized link/meta extraction from HTML
- :mod:`crawlspark.fixture`     replica of the reference's 6-page test site
- :mod:`crawlspark.steps`       the step algebra (filters, refiners, csv/json/dom)
- :mod:`crawlspark.textops`     dedup / language-id / quality / tokens over documents
- :mod:`crawlspark.ann`         similarity search over embedding columns
- :mod:`crawlspark.images`      image payload path (decode/validate/phash)
"""

__version__ = "0.1.0"
