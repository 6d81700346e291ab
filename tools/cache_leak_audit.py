"""Cache-leak audit: runs every registry query through the noop sink,
calls dedup.release_caches on the result (exactly what bench.py does),
then reports any RDDs STILL registered in the CacheManager — each one is
a persist whose handle never reached the returned frame's _vso_caches,
i.e. a cross-query cache subsidy/pressure leak (the class the r11
measurement fix was supposed to eliminate between timed queries).

Usage: python tools/cache_leak_audit.py [query ...]   (default: all)
Prints one line per leaking query with the leaked RDD names, then a
summary. Clears the cache between queries so leaks don't cascade.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from vector_search_optimization_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark("cache_leak_audit")
    qs = entrymod.queries()
    if not names:
        names = list(qs)

    from vector_search_optimization_spark.operators.dedup import (
        release_caches,
    )

    def cached_rdds() -> dict[int, str]:
        jsc = spark.sparkContext._jsc.sc()
        it = jsc.getPersistentRDDs().iterator()
        out = {}
        while it.hasNext():
            t = it.next()
            rdd = t._2()
            out[t._1()] = str(rdd.name() or rdd.toString())[:100]
        return out

    leaks: dict[str, list[str]] = {}
    for name in names:
        spark.catalog.clearCache()
        try:
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            release_caches(df)
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {name}: {e}", flush=True)
            continue
        left = cached_rdds()
        if left:
            leaks[name] = sorted(left.values())
            print(f"LEAK  {name}: {len(left)} cached RDD(s) left", flush=True)
            for v in leaks[name]:
                print(f"      {v}", flush=True)
        else:
            print(f"ok    {name}", flush=True)
    print(f"\n{len(leaks)} of {len(names)} queries leak caches")
    if leaks:
        sys.exit(1)
    spark.stop()


if __name__ == "__main__":
    main()
