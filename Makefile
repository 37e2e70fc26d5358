# Convenience targets. The test suite forces CPU (8-device virtual mesh);
# bench and tpu-checks run on the attached accelerator.

PY ?= python

.PHONY: test test-fast bench tpu-checks native smoke clean

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q --ignore=tests/test_overfit_e2e.py \
	  --ignore=tests/test_panoptic_overfit_e2e.py --ignore=tests/test_cli_smoke.py

bench:
	$(PY) bench.py

tpu-checks:
	PYTHONPATH=.:$$PYTHONPATH $(PY) tests/tpu/run_tpu_checks.py

native:
	g++ -O3 -shared -fPIC mmor_tpu/native/mmor_native.cpp -o mmor_tpu/native/libmmor_native.so

smoke:
	$(PY) -m mmor_tpu.cli.evaluate_sg --synthetic 2 --preset tiny --batch_size 2
	$(PY) -m mmor_tpu.cli.train_mm2sg --synthetic 2 --preset tiny --steps 2 --batch_size 2 --save_every 2 --run_dir /tmp/mmor_smoke_run
	$(PY) -m mmor_tpu.cli.train_panoptic --synthetic --tiny --steps 1 --frames 2 --save_every 1 --run_dir /tmp/mmor_smoke_pan
	$(PY) -m mmor_tpu.cli.eval_panoptic --synthetic --tiny

clean:
	rm -f mmor_tpu/native/libmmor_native.so
	find . -name __pycache__ -type d -exec rm -rf {} +
