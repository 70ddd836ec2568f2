#!/usr/bin/env bash
# Standing amplified-scale verify of the STATEFUL gate subset.
#
# The one-time sf1.0 full-suite run (BASELINE §"One-time sf1.0 hash
# verification") proved no scale-dependent nondeterminism at 10x the
# bench scale; the gates most exposed to it going FORWARD are the
# index/store lifecycle ones (persisted state, markers, delta logs,
# incremental fold-ins). This target re-runs JUST that subset against
# the amplified fixture each round — minutes, not the full sweep —
# rebuilding the fixture via scripts/amplify.py when /tmp was cleared.
#
# Usage: scripts/verify_amplified.sh [srcSfDir] [ampDir] [K]
set -euo pipefail
cd "$(dirname "$0")/.."

SF_SRC=${1:-/root/testdata/sf0.1}
AMP=${2:-/tmp/sf1.0}
K=${3:-10}

GATES=(q109_incremental_lsh q110_stream_inc_lsh q111_incremental_srp
       q112_remove_lsh q113_inc_clusters q114_remove_clusters
       q115_stream_labels q116_remove_label_store q117_remove_srp_clusters
       q121_inc_curation)

if [ ! -f "$AMP/lineitem.parquet" ]; then
  echo "== building amplified fixture at $AMP (x$K of $SF_SRC)"
  python3 scripts/amplify.py "$SF_SRC" "$AMP" "$K"
fi

OUT=$(mktemp -d /tmp/vamp_XXXXXX)
trap 'rm -rf "$OUT"' EXIT
echo "== verifying ${#GATES[@]} stateful gates against $AMP"
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} SPARK_GRAFT_XMX=${SPARK_GRAFT_XMX:-16g} \
  scripts/run_class.sh graft.Verify "$AMP" "$OUT" "${GATES[@]}" 2>/dev/null
python3 scripts/compare.py "$AMP" "$OUT"
