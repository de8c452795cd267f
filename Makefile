# Workflow driver — same target surface as the reference Makefile:11-33
# (with its broken paths fixed: `test`/`debug-evaluate` point at the real
# evaluate_model.py and `cluster` at the real clustering tool; `evaluation`
# runs the in-repo Python WIDER evaluator instead of external octave).
.RECIPEPREFIX +=

PYTHON=python
ROOT=data/WIDER
TRAINDATA=$(ROOT)/wider_face_split/wider_face_train_bbx_gt.txt
VALDATA=$(ROOT)/wider_face_split/wider_face_val_bbx_gt.txt
TESTDATA=$(ROOT)/wider_face_split/wider_face_test_filelist.txt

CHECKPOINT=weights/checkpoint_50

main:
	$(PYTHON) main.py $(TRAINDATA) $(VALDATA) --dataset-root $(ROOT)

resume:
	$(PYTHON) main.py $(TRAINDATA) $(VALDATA) --dataset-root $(ROOT) --resume $(CHECKPOINT) --epochs $(EPOCH)

evaluate:
	$(PYTHON) evaluate_model.py $(VALDATA) --dataset-root $(ROOT) --checkpoint $(CHECKPOINT) --split val

evaluation:
	$(PYTHON) wider_eval.py $(VALDATA) --results-dir val_results

test:
	$(PYTHON) evaluate_model.py $(TESTDATA) --dataset-root $(ROOT) --checkpoint $(CHECKPOINT) --split test

cluster:
	$(PYTHON) tools/cluster_templates.py $(TRAINDATA)

debug:
	$(PYTHON) main.py $(TRAINDATA) $(VALDATA) --dataset-root $(ROOT) --batch_size 1 --workers 0 --debug

debug-evaluate:
	$(PYTHON) evaluate_model.py $(VALDATA) --dataset-root $(ROOT) --checkpoint $(CHECKPOINT) --split val --batch_size 1 --workers 0 --debug

unit-test:
	$(PYTHON) -m pytest tests/ -x -q

bench:
	$(PYTHON) bench.py

bench-train:
	$(PYTHON) bench_train.py

# Serving latency SLO: p50/p95/p99 vs offered load (tools/serving_bench.py)
bench-serving:
	$(PYTHON) tools/serving_bench.py --loads 4,8,12,16 --out serving_slo.json

# Published-mAP runbook: convert -> evaluate (+fused/host-resize A/B) ->
# wider_eval -> pass/fail JSON vs 0.902/0.892/0.797. With real data:
#   make parity-run ROOT=/data/WIDER CHECKPOINT=/data/checkpoint_50.pth \
#                   EVAL_TOOLS=/data/eval_tools
EVAL_TOOLS=
parity-run:
	$(PYTHON) tools/parity_run.py --dataset-root $(ROOT) \
	  --checkpoint $(CHECKPOINT) \
	  $(if $(EVAL_TOOLS),--eval-tools-dir $(EVAL_TOOLS),)

# Rehearse the full runbook today on a synthetic tree (no data/weights).
parity-run-smoke:
	$(PYTHON) tools/parity_run.py --dataset-root /tmp/parity_smoke \
	  --synthetic 12 --ab-images 3

# Compile the standard program set into the persistent XLA cache (run once
# per fresh machine, before the first production run or benchmark).
prewarm:
	$(PYTHON) tools/prewarm_cache.py --transfer both
	$(PYTHON) tools/prewarm_cache.py --transfer jpegdct --skip-train --val-ladder
