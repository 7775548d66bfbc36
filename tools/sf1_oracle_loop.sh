#!/bin/bash
# Per-query DuckDB oracle loop for the sf1 full-registry run (SCALE.md §2):
# one check_oracle.py invocation per query under `timeout`, so a single
# heavy oracle (recursive CTE, quadratic pair construction) can neither
# hang the run nor take the others down with it. q96/q119 are excluded by
# default — their naive twins exceed the scratch disk; graft.tools.ScaleLaws
# is their verification path (SCALE.md §2).
#
# usage: sf1_oracle_loop.sh <verify_out_dir> <sf_dir> <log_file> [start_after]
set -u
OUT=$1; SF=$2; LOG=$3; START=${4:-}
SKIP="q96_copurchase_rank q119_brand_seeded_rank"
MEM=${GRAFT_DUCKDB_MEM:-48GB}
TO=${GRAFT_ORACLE_TIMEOUT:-900}
names=$(python3 - "$OUT" <<'EOF'
import json,sys
from pathlib import Path
print("\n".join(sorted(json.loads((Path(sys.argv[1])/"oracle_sql.json").read_text()))))
EOF
)
started=${START:+0}; started=${started:-1}
for n in $names; do
  if [ "$started" = 0 ]; then
    [ "$n" = "$START" ] && started=1
    continue
  fi
  case " $SKIP " in *" $n "*)
    echo "SKIPPED $n (ScaleLaws path)" >> "$LOG"; continue;;
  esac
  GRAFT_DUCKDB_MEM=$MEM timeout "$TO" \
    python3 tools/check_oracle.py "$OUT" "$SF" "$n" >> "$LOG" 2>&1
  rc=$?
  [ $rc -eq 124 ] && echo "TIMEOUT $n after ${TO}s" >> "$LOG"
  [ $rc -ne 0 ] && [ $rc -ne 124 ] && echo "RC=$rc $n" >> "$LOG"
done
echo "LOOP DONE" >> "$LOG"
