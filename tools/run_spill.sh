#!/bin/bash
# r13 spill proof (VERDICT r12 #6): corpus-pass producers on the 100x
# fixture under 1 GiB executors — completion with non-zero spill, not OOM.
cd /root/repo
export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13
export SPARK_GRAFT_MASTER="local-cluster[2,2,1024]"
export SPARK_GRAFT_CPUS=16
export SPARK_GRAFT_SF_DIR=/tmp/graft_sf10
export SPARK_GRAFT_ONLY=dedup_clusters,curation_pipeline_staged
export SPARK_GRAFT_TIMELINE=artifacts/r13/r13_spill.json
exec java -Dspark.executor.extraClassPath=/root/repo/target/scala-2.13/classes \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench
