set -e
cd /root/repo
export JAX_PLATFORMS=cpu PYTHONPATH=/root/repo
run() { echo "=== $* ==="; timeout 580 python -m "$@" 2>&1 | tail -1; }
run egot2x.cli.run_lam --model BaselineLSTM --synthetic --fast_dev_run
run egot2x.cli.run_lam --model GazeLSTM --synthetic --fast_dev_run
run egot2x.cli.run_ttm --model TTMBaselineLSTM --synthetic --fast_dev_run
run egot2x.cli.run_ttm --model TaskFusionMFTransformer3Task --synthetic --two_loader --fast_dev_run
run egot2x.cli.run_ttm --model FinetuneTTM --synthetic --two_loader --fast_dev_run
run egot2x.cli.run_asd --synthetic --fast_dev_run
run egot2x.cli.run_asd --synthetic --two_loader --fast_dev_run
run egot2x.cli.pnr_train --task keyframe_localisation --synthetic --fast_dev_run
run egot2x.cli.pnr_train --task state_change_classification --synthetic --fast_dev_run
run egot2x.cli.pnr_train --task state_change_detection_and_keyframe_localisation --synthetic --fast_dev_run
run egot2x.cli.pnr_train --task keyframe_localisation2loader --synthetic --fast_dev_run
run egot2x.cli.pnr_train --task state_change_classification2loader --synthetic --fast_dev_run
run egot2x.cli.run_lta --task classification --synthetic --fast_dev_run
run egot2x.cli.run_lta --task classification --model MultiTaskMViT --synthetic --fast_dev_run
run egot2x.cli.run_lta --task long_term_anticipation --synthetic --fast_dev_run
run egot2x.cli.run_lta --task recognition2loader --synthetic --fast_dev_run
run egot2x.cli.run_lta --task lta2loader --synthetic --fast_dev_run
run egot2x.cli.run_sta --synthetic --fast_dev_run
run egot2x.cli.run_multitask --synthetic --fast_dev_run
run egot2x.cli.run_multitask --task unified --synthetic --fast_dev_run
run egot2x.cli.multitask_run --task unify6task --synthetic --fast_dev_run
run egot2x.cli.multitask_run --task unify3task --synthetic --fast_dev_run
run egot2x.cli.multitask_run --task unify4task --synthetic --fast_dev_run
run egot2x.cli.multitask_run --task unify4taskaction --synthetic --fast_dev_run
run egot2x.cli.multitask_run --task task12 --synthetic --fast_dev_run
run egot2x.cli.multitask_run --task pnr_only --synthetic --fast_dev_run
run egot2x.cli.multitask_run --task oscc_only --synthetic --fast_dev_run
run egot2x.cli.run_lta --task long_term_anticipation_seq --synthetic --fast_dev_run
run egot2x.cli.run_lta --task long_term_anticipation_separateseq --synthetic --fast_dev_run
run egot2x.cli.submit --target oscc --synthetic
run egot2x.cli.submit --target ttm --synthetic
echo "SWEEP DONE"
