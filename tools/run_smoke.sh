#!/bin/bash
# Smoke-run helper: direct-java Bench invocation (bypasses sbt).
# Usage: tools/run_smoke.sh <sfdir> <cpus> <xmx> <only-csv> [invalidate-csv]
# Scale dirs come from tools/gen_scale.sh — whose CANONICAL decade
# regime is constant keyword density (KEYVOCAB=grow); fixed-vocab is
# the labeled adversarial-skew regime, never the default decade data.
set -u
AO="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
cd /root/repo
mkdir -p /tmp/graft_scratch
SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS="$2" \
SPARK_GRAFT_PREWARM="${SPARK_GRAFT_PREWARM:-1}" \
SPARK_GRAFT_LOCAL_DIR=/tmp/graft_scratch \
SPARK_GRAFT_RELEASE="q_d11_keep_best=minhashPairs,q_ep3_corpus_card=cardPairs,q_g48_leiden_refine=louvainCo50" \
SPARK_GRAFT_ONLY="$4" \
SPARK_GRAFT_INVALIDATE="${5:-}" \
java $AO -Xmx"$3" -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench
