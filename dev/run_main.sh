#!/usr/bin/env bash
# Run a graft main class against a frozen classes dir without sbt (so a
# long background run never races an sbt recompile of the working tree).
#   usage: CLASSES=/tmp/graft_classes_r10 dev/run_main.sh graft.Verify args...
# Env: CLASSES (default target/scala-2.13/classes), JVM_MEM (default 16g),
#      SPARK_GRAFT_CPUS etc. pass through.
set -euo pipefail
CLASSES="${CLASSES:-/root/repo/target/scala-2.13/classes}"
JVM_MEM="${JVM_MEM:-16g}"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Xmx"$JVM_MEM" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" "$@"
