#!/bin/bash
# Scale-corpus generator wrapper (graft.ScaleGen, direct-java).
#
# CANONICAL decade regime: constant keyword DENSITY
# (SPARK_GRAFT_KEYVOCAB=grow) — real 10x web growth adds keys/topics,
# not 10x-deeper keyword buckets. Round 11 measured the flagship
# pipeline at 2.8x/decade under grow vs 19.7x under fixed-vocab
# replication; the latter is a generator artifact of replicating a
# fixed vocabulary and is kept ONLY as the labeled adversarial-SKEW
# regime (it is a good skew stress — AQE skew handling is exactly what
# it exercises): export SPARK_GRAFT_KEYVOCAB=fixed explicitly to get it.
#
# Usage: tools/gen_scale.sh SRC OUT REPLICAS [FAMSIZE] [SHIFT]
#   e.g. tools/gen_scale.sh /root/testdata/sf0.1 /tmp/sf1  10
#        tools/gen_scale.sh /root/testdata/sf0.1 /tmp/sf10 100 10
#        tools/gen_scale.sh /tmp/sf10 /tmp/sf100 10 1 10000000000  (chain)
set -eu
AO="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
cd /root/repo
SPARK_GRAFT_SRC="$1" SPARK_GRAFT_OUT="$2" SPARK_GRAFT_REPLICAS="$3" \
SPARK_GRAFT_FAMSIZE="${4:-$3}" \
SPARK_GRAFT_SHIFT="${5:-10000000}" \
SPARK_GRAFT_KEYVOCAB="${SPARK_GRAFT_KEYVOCAB:-grow}" \
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" \
java $AO -Xmx48g -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.ScaleGen
