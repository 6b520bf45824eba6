#!/usr/bin/env bash
# Run a graft main (graft.Verify / graft.Bench) via plain java, outside
# sbt — lets a long invariance sweep run in the background while sbt
# keeps the foreground (sbt's target/ lock allows only one process).
# Mirrors build.sbt's fork options (JDK17 add-opens, UTC, no UI).
# Usage: tools/run_main.sh graft.Verify <sfDir> <outDir> [queries]
set -euo pipefail
cd "$(dirname "$0")/.."
OPENS=(java.lang java.lang.invoke java.lang.reflect java.io java.net \
  java.nio java.util java.util.concurrent java.util.concurrent.atomic)
FLAGS=()
for p in "${OPENS[@]}"; do FLAGS+=("--add-opens=java.base/$p=ALL-UNNAMED"); done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  FLAGS+=("--add-opens=java.base/$p=ALL-UNNAMED")
done
# SPARK_EXTRA_JAVA_OPTS: additional JVM flags, e.g. static Spark confs
# that must precede SparkContext creation (-Dspark.memory.fraction=0.2
# for the constrained-memory proof runs — SparkConf loads spark.*
# system properties).
# shellcheck disable=SC2086
# SPARK_GRAFT_CP: override the classes dir (e.g. a snapshot copy, so a
# background sweep keeps a stable binary while sbt recompiles the live
# target/ in the foreground).
exec java "${FLAGS[@]}" \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" ${SPARK_EXTRA_JAVA_OPTS:-} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "${SPARK_GRAFT_CP:-target/scala-2.13/classes}:/opt/spark/jars/*" "$@"
