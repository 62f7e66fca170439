#!/bin/bash
# COLD-SCRATCH headline bench (VERDICT r18 next-round #1a): wipe every
# amortized disk layout under target/scratch (EXCEPT the scaleN
# synthetic inflations, which are test DATA, not derived layouts), then
# run the 25-op headline bench once and commit the result as
# docs/bench_cold.json. The point is falsifiability: every
# provisionIfStale layout's build cost becomes a measured, per-round
# committed number instead of an invisible one-time cost no bench run
# ever pays again. Round cadence: run once per round after the final
# code state, commit docs/bench_cold.json alongside the round artifacts.
#
# Usage: tools/bench_cold.sh  (from the repo root)
set -euo pipefail
cd "$(dirname "$0")/.."

SCRATCH=target/scratch
if [ -d "$SCRATCH" ]; then
  find "$SCRATCH" -mindepth 1 -maxdepth 1 ! -name 'scale*' -exec rm -rf {} +
fi

# the headline list lives in graft.Bench.headline; keep this in sync
OPS="q1_pricing_summary,q3_shipping_priority,q9_profit,q18_large_orders,\
q21_waiting_supplier,q_window_running,q_heavy_hitters,q_asof_join,lake_scan,\
lake_bucketed_join,lake_time_travel,d_minhash_lsh,d_dup_clusters,\
d_corpus_curate,d_embed_neardup,s_ann_bruteforce,s_ann_ivf_partitioned,\
s_ann_pq,t_ngram_freq,t_lang_id,st_session_window,st_stream_neardup,\
lake_zorder,q_bloom_join,g_pagerank"

SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
SPARK_GRAFT_ONLY="$OPS" \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' || true

cp docs/bench_only.json docs/bench_cold.json
echo "wrote docs/bench_cold.json"

# Bench's outlier-remeasure arm replaces most cold first-pass times
# with warm minima (the layouts exist by the rerun), so the per-op
# PROVISIONING cost only survives in first_pass_vs_best. Second pass:
# wipe again and run the Probe tool (reps=2) — rep1 carries each op's
# cold cost (provisioning included), rep2 its steady state; the pair
# is the per-op provisioning attribution the cold artifact exists for.
find "$SCRATCH" -mindepth 1 -maxdepth 1 ! -name 'scale*' -exec rm -rf {} +
SPARK_GRAFT_PROBE_REPS=2 SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  sbt -batch "runMain graft.tools.Probe ${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} ${OPS//,/ }" 2>/dev/null \
  | grep PROBE | sed 's/^\[info\] //' > /tmp/bench_cold_probe.txt
python3 - <<'PYEOF'
import json, re
rows = {}
for line in open("/tmp/bench_cold_probe.txt"):
    m = re.match(r"PROBE (\S+)\s+([0-9.]+)\s+([0-9.]+)", line)
    if m:
        rows[m.group(1)] = {"cold": float(m.group(2)), "steady": float(m.group(3)),
                            "provision": round(float(m.group(2)) - float(m.group(3)), 3)}
json.dump({"note": "per-op cold (first touch after scratch wipe, provisioning "
                   "included) vs steady seconds; Probe reps=2, count() action",
           "ops": rows}, open("docs/bench_cold_probe.json", "w"), indent=1)
print("wrote docs/bench_cold_probe.json", len(rows), "ops")
PYEOF
