#!/bin/sh
# Round-18 artifact chain. Two bench sessions PER SCALE (r17 verdict #2:
# state the cross-session noise band and judge against it), the parallel-DML
# speedup harness (verdict #3), TIMEONE cohorts covering this round's
# adjudication names, and the full tallies at both gate scales LAST (the
# r16 lesson: benching right after a full tally is the worst page-cache
# window — so tallies go after all timing work).
set -x
cd /root/repo

if [ ! -d /tmp/graft_scale/sf5/lineitem.parquet ]; then
  sbt -batch 'Test/runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/graft_scale/sf1 10'
  sbt -batch 'Test/runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/graft_scale/sf5 50'
  python3 tools/scaleup_events.py /root/testdata/sf0.1 /tmp/graft_scale/sf1 10
  python3 tools/scaleup_events.py /root/testdata/sf0.1 /tmp/graft_scale/sf5 50
  sleep 30
fi

# Parallel-DML like-for-like comparison (verdict #3), before the bench
# sessions so its Derby churn doesn't sit between two same-scale sessions.
sbt -batch 'Test/runMain graft.tools.TimeDmlPar /tmp/graft_scale/sf1 64 3' \
  > /tmp/r18_dmlpar_sf1.log 2>&1
sbt -batch 'Test/runMain graft.tools.TimeDmlPar /tmp/graft_scale/sf5 64 3' \
  > /tmp/r18_dmlpar_sf5.log 2>&1

# Bench trio, TWO sessions per scale (a/b), back to back at the same HEAD.
for tag in a b; do
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_BENCH_OUT=/tmp/r18_bench_sf0.1_$tag.json sbt -batch "runMain graft.Bench"
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/tmp/graft_scale/sf1 \
    SPARK_GRAFT_BENCH_OUT=/tmp/r18_bench_sf1_$tag.json sbt -batch "runMain graft.Bench"
  SPARK_DRIVER_MEM=16g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/tmp/graft_scale/sf5 \
    SPARK_GRAFT_BENCH_OUT=/tmp/r18_bench_sf5_$tag.json sbt -batch "runMain graft.Bench"
done

# TIMEONE cohort: this round's adjudication names — the two r17-weak names
# (bounded-claim evidence), the q_stream_join_parity drift (verdict #2),
# the post-fix beam walk, the stream entry that spiked in the r18 probe
# session, and the expensive dml/stream names for cost attribution.
tools/timeone_batch.sh /tmp/graft_scale/sf1 /tmp/TIMEONE_sf1_r18.txt \
  dml_chunked_delete dml_chunked_jdbc dml_chunked_dedup dml_chunked_merge \
  dml_chunked_update_par x_stream_countmin x_ann_beam x_ann_beam_recall \
  x_lang_classifier q_stream_join_parity x_stream_semantic_tiered \
  x_bpe_apply x_boilerplate_scrub
SPARK_DRIVER_MEM=16g tools/timeone_batch.sh /tmp/graft_scale/sf5 /tmp/TIMEONE_sf5_r18.txt \
  dml_chunked_delete dml_chunked_jdbc dml_chunked_dedup dml_chunked_merge \
  dml_chunked_update_par x_stream_countmin x_ann_beam x_ann_beam_recall \
  x_lang_classifier q_stream_join_parity x_stream_semantic_tiered \
  x_bpe_apply x_boilerplate_scrub

tools/full_tally.sh /root/testdata/sf0.01 /tmp/ORACLE_sf0.01_r18.txt
tools/full_tally.sh /root/testdata/sf0.1 /tmp/ORACLE_sf0.1_r18.txt

echo R18_CHAIN_DONE
