#!/bin/bash
# Round-5: inject the recording-gated lockstep replay jobs into the TPU
# spool ONCE their torch recording exists (keeps single-TPU-client
# exclusivity by serializing through the spool instead of running them
# by hand). Usage: bash inject_replays.sh {lgcn|bm3} NN
# where NN is the 3-digit spool position prefix to use (e.g. 031).
set -eu
cd /root/repo
SP=log/tpu_spool
case "$1" in
  lgcn)
    REC=/tmp/foodrec_parity/lockstep/LightGCN_allrecipes_999_2ep/REF_COMPLETE
    [ -f "$REC" ] || { echo "lgcn recording not ready"; exit 1; }
    cp campaigns/manual_r5/tpu_050_lockstep_allrec_lgcn_ours.job  "$SP/tpu_$2a_lockstep_allrec_lgcn_ours.job"
    cp campaigns/manual_r5/tpu_055_lockstep_allrec_lgcn_chaos.job "$SP/tpu_$2b_lockstep_allrec_lgcn_chaos.job"
    cp campaigns/manual_r5/tpu_056_lockstep_allrec_lgcn_prec.job  "$SP/tpu_$2c_lockstep_allrec_lgcn_prec.job"
    ;;
  bm3)
    REC=/tmp/foodrec_parity/lockstep/BM3_allrecipes_999_2ep/REF_COMPLETE
    [ -f "$REC" ] || { echo "bm3 recording not ready"; exit 1; }
    cp campaigns/manual_r5/tpu_060_lockstep_allrec_bm3_ours.job  "$SP/tpu_$2a_lockstep_allrec_bm3_ours.job"
    cp campaigns/manual_r5/tpu_065_lockstep_allrec_bm3_chaos.job "$SP/tpu_$2b_lockstep_allrec_bm3_chaos.job"
    ;;
  *) echo "unknown group $1"; exit 1;;
esac
ls "$SP"
