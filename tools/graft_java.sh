#!/bin/bash
# Run a graft main class directly against the compiled classes + Spark jars
# (skips sbt startup). Usage: tools/graft_java.sh <MainClass> [args...]
cd "$(dirname "$0")/.."
# local-cluster mode (graft.ClusterCheck) launches executor JVMs through
# the Spark launcher, whose getScalaVersion() probe fails on a binary
# distribution unless told the Scala version explicitly.
export SPARK_HOME="${SPARK_HOME:-/opt/spark}"
export SPARK_SCALA_VERSION="${SPARK_SCALA_VERSION:-2.13}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS -Xmx${SPARK_DRIVER_MEM:-16g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
