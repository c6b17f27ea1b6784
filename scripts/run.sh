#!/bin/bash
# Dev helper: run a graft main class without sbt startup overhead.
# Usage: scripts/run.sh graft.Verify /root/testdata/sf0.001 /tmp/verify_out
set -e
# SPARK_GRAFT_CLASSES: alternate compiled-class tree (code-change A/B).
CP="${SPARK_GRAFT_CLASSES:-/root/repo/target/scala-2.13/classes}:/opt/spark/jars/*"
ADD_OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens $p=ALL-UNNAMED"
done
# No raised spark.driver.maxResultSize: the large-output stream
# drains (dup_spans/media/append) sink per-batch to parquet
# (StreamQueries.drain parquetSink) instead of accumulating in a
# driver-side memory sink, so the 1 GiB default is the honest guard
# again — a query that trips it is genuinely collecting too much.
# SPARK_GRAFT_JAVA_OPTS: extra -D flags for config A/B experiments
# (Spark reads spark.* system properties into every SparkConf).
exec java $ADD_OPENS -Xmx"${SPARK_GRAFT_XMX:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  ${SPARK_GRAFT_JAVA_OPTS:-} \
  -cp "$CP" "$@"
