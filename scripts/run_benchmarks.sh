#!/usr/bin/env bash
# Benchmark runner (ref parity: benchmark/scripts/run_benchmarks.sh flag
# surface, docs/user-guide/benchmarking.md:70-110).
set -euo pipefail

WORKLOADS=()
PARAMS="{}"
OUTPUT_DIR="./benchmark_results"
COST=""
REPORT=""

while [[ $# -gt 0 ]]; do
  case "$1" in
    --all) WORKLOADS=(--all); shift ;;
    --weather|--nbody|--signal|--medical|--geospatial)
      name="${1#--}"
      [[ "${WORKLOADS[*]-}" == "--all" ]] || WORKLOADS+=("$name"); shift ;;
    --molecular-dynamics) WORKLOADS+=(molecular_dynamics); shift ;;
    --weather-grid) PARAMS=$(python - "$PARAMS" "$2" <<'EOF'
import json, sys
p = json.loads(sys.argv[1]); p.setdefault("weather", {})["grid_size"] = int(sys.argv[2])
print(json.dumps(p))
EOF
); shift 2 ;;
    --cost) COST="--cost $2"; shift 2 ;;
    --output-dir) OUTPUT_DIR="$2"; shift 2 ;;
    --report) REPORT="--report"; shift ;;
    *) echo "unknown flag $1" >&2; exit 2 ;;
  esac
done

if [[ "${WORKLOADS[*]-}" == "--all" ]]; then
  exec python -m njw_tpu.bench --all --params "$PARAMS" \
      --output-dir "$OUTPUT_DIR" $COST $REPORT
else
  exec python -m njw_tpu.bench --workloads "${WORKLOADS[@]}" \
      --params "$PARAMS" --output-dir "$OUTPUT_DIR" $COST $REPORT
fi
