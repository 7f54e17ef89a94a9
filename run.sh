#!/usr/bin/env bash
# Driver wrapper with the reference's interface (/root/reference/run.sh):
#   ./run.sh group={1,2} config={8,...,21,16b,17b,20b,tiny}[,more]
# Extra args are passed through to drivers/run_msm.py.
set -euo pipefail

group=1
configs=tiny
extra=()
for arg in "$@"; do
  case "$arg" in
    group=*)  group="${arg#group=}" ;;
    config=*) configs="${arg#config=}" ;;
    *)        extra+=("$arg") ;;
  esac
done

IFS=',' read -ra cfg_list <<< "$configs"
for cfg in "${cfg_list[@]}"; do
  echo "=== group=$group config=$cfg ==="
  python drivers/run_msm.py --group "$group" --config "$cfg" ${extra[@]+"${extra[@]}"}
done
