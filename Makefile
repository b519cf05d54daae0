.PHONY: test test-fast bench golden dryrun multihost lint tpu-smoke tpu-smoke-full placement-table

tpu-smoke:       ## every wired Pallas kernel + masked engine on the real chip vs XLA (<2 min warm)
	python tools/tpu_smoke.py
	python tools/mosaic_envelope_probe.py

tpu-smoke-full:  ## + the chunked (>2^16) sort
	python tools/tpu_smoke.py --full

placement-table: ## branch-placement boundary table across counting conventions
	python tools/placement_parity.py

test:            ## full suite (virtual 8-device CPU mesh; ~15-25 min cold)
	python -m pytest tests/ -q

test-fast:       ## skip the slow end-to-end CLI runs
	python -m pytest tests/ -q -m "not slow"

bench:           ## headline 512² images/sec/chip (JSON line)
	python bench.py

bench-train:     ## training-step throughput
	python tools/bench_train.py

bench-serving:   ## gated-serving throughput + FLOPs fractions
	python tools/bench_serving.py

sweep:           ## exit-threshold trade-off curve (needs -M checkpoint args)
	python tools/sweep_thresholds.py $(ARGS)

golden:          ## regenerate golden values from the reference checkout
	python tools/gen_golden.py

dryrun:          ## multi-chip sharding dry run on 8 virtual CPU devices
	XLA_FLAGS=--xla_force_host_platform_device_count=8 python -c \
	  "import jax; jax.config.update('jax_platforms','cpu'); \
	   import __graft_entry__ as G; G.dryrun_multichip(8)"

multihost:       ## real 2-process jax.distributed smoke: DP step + composed dp x sp x accum x mesh eval (Gloo)
	python tools/multihost_smoke.py --nprocs 2

real-data:       ## turnkey real-VOC day: validate -> short train -> all eval CLIs -> 0.2-pt parity checklist
	@test -n "$(DATA)" || (echo "usage: make real-data DATA=/path/containing/VOCdevkit" && exit 1)
	python tools/real_data_drill.py --data $(DATA)

convergence:     ## torch-reference vs ours: trained-checkpoint migration + from-scratch mIoU parity
	python tools/convergence_parity.py --loss ce --epochs 12

lint:            ## bytecode-compile everything (fast sanity)
	python -m compileall -q ee_semantic_segmentation_tpu tools tests *.py
