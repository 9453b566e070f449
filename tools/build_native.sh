#!/bin/bash
# Build crawlspark's native JVM helpers OFFLINE using the scala-compiler
# jar that ships inside the Spark distribution (no sbt, no network).
# Output: crawlspark/jars/crawlspark-native.jar
set -euo pipefail
cd "$(dirname "$0")/.."
J="${SPARK_JARS_DIR:-/opt/spark-4.1.2-bin-hadoop3/jars}"
OUT=native/classes
rm -rf "$OUT" && mkdir -p "$OUT" crawlspark/jars
CP="$J/scala-compiler-2.13.17.jar:$J/scala-library-2.13.17.jar:$J/scala-reflect-2.13.17.jar"
SPARK_CP=$(ls "$J"/spark-*.jar | tr '\n' ':')
java -cp "$CP" scala.tools.nsc.Main -usejavacp \
  -classpath "$SPARK_CP$J/scala-library-2.13.17.jar" \
  -d "$OUT" native/src/*.scala
jar cf crawlspark/jars/crawlspark-native.jar -C "$OUT" .
echo "built crawlspark/jars/crawlspark-native.jar"
