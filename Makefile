# Task runner — workflow parity with the reference's root Makefile
# (reference Makefile: train/test/solver/tooling targets encoding the
# canonical hyperparameters per workflow).

PY := python

.PHONY: help solver solver-test test test-fast e2e bench data train-v3 \
        train-v1 train-combined evaluate cv-test extract-cells serve \
        export-onnx clean sweep harvest-scenes train-real verify-claims

help:
	@echo "targets: solver solver-test test e2e bench data train-v3 train-v1"
	@echo "         train-combined evaluate cv-test extract-cells serve"
	@echo "         export-onnx clean"

# --- native solver ---
solver:
	$(MAKE) -C native/solver all

solver-test:
	$(MAKE) -C native/solver test

# --- tests ---
test: solver
	$(PY) -m pytest tests/ -x -q

test-fast:
	$(PY) -m pytest tests/test_solver.py tests/test_reasoning.py -q

# --- e2e + benchmarks (TPU) ---
e2e:
	$(PY) -m sudoku_vision_tpu.harness.e2e_runner --history

bench:
	$(PY) bench.py

pipeline-bench:
	$(PY) -m sudoku_vision_tpu.pipeline.benchmark --batch 32

# --- data + training (canonical hyperparameters) ---
data:
	$(PY) -m sudoku_vision_tpu.ml.generate_synthetic \
	    --out data/synthetic --per-class 1500 --seed 2

train-v3:
	$(PY) -m sudoku_vision_tpu.ml.train --dataset synthetic \
	    --data-dir data/synthetic --model v3 --epochs 30 \
	    --batch-size 256 --augment medium --calibrate --out digit_cnn_v3

train-v1:
	$(PY) -m sudoku_vision_tpu.ml.train --dataset synthetic \
	    --data-dir data/synthetic --model v1 --epochs 10 \
	    --batch-size 256 --augment light --mixup 0 --out digit_cnn_v1

# Real cells come from the extract -> label_from_truth -> prepare chain:
#   make extract-cells && python -m sudoku_vision_tpu.tools.label_from_truth
#   && python -m sudoku_vision_tpu.tools.prepare_real_data --labels
#   data/cells/labeled_cells.json --cells data/cells --per-image-csvs
train-combined:
	$(PY) -m sudoku_vision_tpu.ml.train --dataset combined \
	    --data-dir data/synthetic_r2 --real-dir data/cells --model v3 \
	    --epochs 15 --batch-size 256 --augment medium --calibrate \
	    --no-clahe --pretrained digit_cnn_v3_final \
	    --out digit_cnn_v3_combined

# The deployed flagship: combined fine-tune checkpointed by best REAL
# accuracy on data/real/val (reference ml/train.py:334-341 policy).
# data/real is the organize_dataset.py split of the labeled cells:
#   python -m sudoku_vision_tpu.tools.organize_dataset --cells data/cells \
#       --labels data/cells/labeled_cells.json --out data/real
# Scene cells: pipeline-harvested deployment-distribution crops
# (detect->warp->extract artifacts incl. residual rotation). Without
# them, real-cell fine-tunes drift the boundary and flip marginal
# deployment cells (PLAN.md round-3 whack-a-mole).
# Fresh-seed robustness sweep with a date-derived seed base: nothing in
# the repo was ever tuned against today's scenes. Exit 1 on any
# wrong_solve. The small always-on CPU variant is tests/test_sweep_ci.py.
sweep:
	$(PY) -m sudoku_vision_tpu.harness.scene_sweep --n 32 \
	    --seed-base $$(date +8%Y%m%d) --out /tmp/sweep_failures

harvest-scenes:
	$(PY) -m sudoku_vision_tpu.tools.harvest_scene_cells \
	    --n 132 --seed-base 31000 --out data/scene_cells

train-real:
	$(PY) -m sudoku_vision_tpu.ml.train --dataset combined \
	    --data-dir data/synthetic --real-dir data/real --real-weight 5 \
	    --real-empty-weight 1 --scene-dir data/scene_cells \
	    --model v3 --epochs 10 --batch-size 256 \
	    --lr 3e-4 --augment medium --rot-deg 32 --calibrate --no-clahe \
	    --pretrained digit_cnn_v3_final --eval-real-dir data/real \
	    --out digit_cnn_v3_real

evaluate:
	$(PY) -m sudoku_vision_tpu.ml.evaluate --ckpt digit_cnn_v3 \
	    --model v3 --data-dir data/synthetic --plots eval_out/

# --- CV validation + tooling ---
cv-test:
	$(PY) -m sudoku_vision_tpu.cv.test_pipeline --debug-out debug_output/

extract-cells:
	$(PY) -m sudoku_vision_tpu.tools.extract_cells \
	    --input data/golden --output data/cells

# --- serving + export ---
serve:
	$(PY) -m sudoku_vision_tpu.serve.server --port 8602

export-onnx:
	$(PY) -m sudoku_vision_tpu.ml.export --ckpt digit_cnn_v1 --model v1 \
	    --out models_export/digit_cnn_v1.onnx

clean:
	$(MAKE) -C native/solver clean
	rm -rf debug_output eval_out .pytest_cache

# Cold-reader audit (RESULTS.md contract): regenerate every fast claim
# end-to-end — native solver suite + perf limits, CoreML emission
# walked and byte-verified, the shipped ONNX/bundle artifacts EXECUTED
# vs flax, real-photo holdout floors, uniqueness gates, the shipped
# scanner sources executed. TPU-hours claims (sweeps, e2e, bench) list
# their exact commands in RESULTS.md.
verify-claims: solver-test
	$(PY) -m sudoku_vision_tpu.ml.coreml_emit \
	    --ckpt digit_cnn_v3_real --out /tmp/_vc.mlpackage
	$(PY) -m pytest -q tests/test_coreml_emit.py tests/test_onnx_eval.py \
	    tests/test_empty_gate.py tests/test_real_data.py \
	    tests/test_uniqueness_gate.py tests/test_wasm_artifact.py \
	    tests/test_scanner_js.py
	@echo "verify-claims: all fast claims regenerated"
