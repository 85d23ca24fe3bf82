import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .getOrCreate())
import __spark_entry__ as e
df = e.entry(spark)
n = df.count()
assert n > 0, "entry returned no rows"
q, o = e.queries(), e.oracle_sql()
assert set(o) <= set(q), "oracle keys not subset of queries"
print("driver sim ok:", n, "rows;", len(q), "queries;", len(o), "oracles")
