#!/bin/bash
# Build crawlspark's native JVM helpers OFFLINE using the scala-compiler
# jar that ships inside the Spark distribution (no sbt, no network).
# Output: crawlspark/jars/crawlspark-native.jar (override with OUT_JAR)
# plus native/CHECKSUMS — per-class-file md5 digests so reviewers (and
# tests/test_native.py::test_committed_jar_matches_source) can verify
# the committed binary matches native/src without trusting it.
set -euo pipefail
cd "$(dirname "$0")/.."
J="${SPARK_JARS_DIR:-/opt/spark-4.1.2-bin-hadoop3/jars}"
OUT=native/classes
OUT_JAR="${OUT_JAR:-crawlspark/jars/crawlspark-native.jar}"
rm -rf "$OUT" && mkdir -p "$OUT" "$(dirname "$OUT_JAR")"
CP="$J/scala-compiler-2.13.17.jar:$J/scala-library-2.13.17.jar:$J/scala-reflect-2.13.17.jar"
SPARK_CP=$(ls "$J"/spark-*.jar | tr '\n' ':')
java -cp "$CP" scala.tools.nsc.Main -usejavacp \
  -classpath "$SPARK_CP$J/scala-library-2.13.17.jar" \
  -d "$OUT" native/src/*.scala
jar cf "$OUT_JAR" -C "$OUT" .
( cd "$OUT" && find . -name '*.class' | sort | xargs md5sum ) > native/CHECKSUMS
echo "built $OUT_JAR ($(wc -l < native/CHECKSUMS) class files; digests in native/CHECKSUMS)"
