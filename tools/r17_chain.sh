#!/bin/sh
# Round-17 artifact chain: scale-gen -> bench trio -> TIMEONE cohorts ->
# full tallies at both gate scales. One sequential script because sbt
# locks the project dir. Order puts the DuckDB-heavy tallies LAST — the
# r16 lesson that benching right after a full tally is the worst
# page-cache window.
set -x
cd /root/repo

# Scale dirs already regenerated this session; skip straight to the trio.
if [ ! -d /tmp/graft_scale/sf5/lineitem.parquet ]; then
  sbt -batch 'Test/runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/graft_scale/sf5 50'
  python3 tools/scaleup_events.py /root/testdata/sf0.1 /tmp/graft_scale/sf5 50
  sleep 60
fi

SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_OUT=/tmp/r17_bench_sf0.1.json sbt -batch "runMain graft.Bench"
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/tmp/graft_scale/sf1 \
  SPARK_GRAFT_BENCH_OUT=/tmp/r17_bench_sf1.json sbt -batch "runMain graft.Bench"
SPARK_DRIVER_MEM=16g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/tmp/graft_scale/sf5 \
  SPARK_GRAFT_BENCH_OUT=/tmp/r17_bench_sf5.json sbt -batch "runMain graft.Bench"

tools/timeone_batch.sh /tmp/graft_scale/sf1 /tmp/TIMEONE_sf1_r17.txt \
  dml_chunked_delete dml_chunked_jdbc dml_chunked_dedup dml_chunked_merge \
  dml_chunked_update_par x_stream_countmin x_hard_negatives \
  x_stream_dedup_manifest x_ann_beam x_ann_beam_recall \
  x_graph_pagerank_converged x_graph_pagerank_deep
SPARK_DRIVER_MEM=16g tools/timeone_batch.sh /tmp/graft_scale/sf5 /tmp/TIMEONE_sf5_r17.txt \
  dml_chunked_delete dml_chunked_jdbc dml_chunked_dedup dml_chunked_merge \
  dml_chunked_update_par x_stream_countmin x_stream_dedup_manifest x_hard_negatives

tools/full_tally.sh /root/testdata/sf0.01 /tmp/ORACLE_sf0.01_r17.txt
tools/full_tally.sh /root/testdata/sf0.1 /tmp/ORACLE_sf0.1_r17.txt

echo R17_CHAIN_DONE
