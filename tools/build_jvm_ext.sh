#!/bin/sh
# Build the Catalyst extension jar (index-covered COUNT rewrite for
# plain spark.sql) against the pyspark-bundled Spark jars. Pure javac —
# the environment has no offline Scala toolchain, so the extension is
# written in Java (see columnar_spark/jvm/src/*.java).
#
# Output: columnar_spark/jvm/columnar-spark-ext.jar (committed, ~10 KB,
# rebuildable with this script).
set -e
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
SPARK_JARS="$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "jars"))')"
BUILD="$ROOT/columnar_spark/jvm/build"
rm -rf "$BUILD" && mkdir -p "$BUILD"
javac -encoding UTF-8 -cp "$SPARK_JARS/*" -d "$BUILD" "$ROOT"/columnar_spark/jvm/src/*.java
jar cf "$ROOT/columnar_spark/jvm/columnar-spark-ext.jar" -C "$BUILD" .
rm -rf "$BUILD"
echo "built $ROOT/columnar_spark/jvm/columnar-spark-ext.jar"
