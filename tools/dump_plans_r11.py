"""Dump .explain('formatted') for named catalog queries to plans/r11/<q>_<tag>.txt."""
import os, sys
sys.path.insert(0, "/root/repo")

def main():
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from data_misc_tools_spark.session import build_session
    spark = build_session(app_name="dump_plans", master=f"local[{cpus}]",
                          shuffle_partitions=int(cpus) if cpus.isdigit() else 32)
    spark.sparkContext.setLogLevel("ERROR")
    from data_misc_tools_spark.catalog import QUERIES
    for n in names:
        df = QUERIES[n](spark, sf_dir)
        p = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(f"plans/r11/{n}_{tag}.txt", "w") as f:
            f.write(p)
        print(f"wrote plans/r11/{n}_{tag}.txt ({len(p)} bytes)")
    return 0

if __name__ == "__main__":
    raise SystemExit(main())
