#!/bin/bash
# Dev loop: verify + oracle-check a comma-separated query list at a given sf.
# Usage: tools/dev_check.sh q248_sortino,q249_expected_shortfall [sf_dir]
set -e
QS="$1"
SF="${2:-/root/testdata/sf0.01}"
OUT=/tmp/verify14
rm -rf "$OUT/only"   # a failed query must not leave a stale dump behind
SPARK_GRAFT_ONLY="$QS" sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 \
  | grep -E "\[verify\].*failed|Exception" || true
python3 - "$QS" <<'EOF'
import json, sys
names = set(sys.argv[1].split(","))
o = json.load(open("/tmp/verify14/oracle_sql.json"))
json.dump({k: v for k, v in o.items() if k in names},
          open("/tmp/verify14/only/oracle_sql.json", "w"))
EOF
python3 tools/check_oracle.py $OUT/only "$SF"
