# Build all native components (auto-built on first use by their ctypes
# shims; this target just builds them eagerly).
.PHONY: native clean test slow-gates

native:
	$(MAKE) -C cpp/pmc
	$(MAKE) -C cpp/kernelmap
	$(MAKE) -C cpp/gcransac

clean:
	$(MAKE) -C cpp/pmc clean
	$(MAKE) -C cpp/kernelmap clean
	$(MAKE) -C cpp/gcransac clean

test:
	python -m pytest tests/ -q

# The slow-marked gate set (production-stack torch parity at N=2500 AND
# N=12000, ring-model equality, slow DGR-DP variants, train->eval
# loops). The default suite SKIPS these; run once per round and commit
# the log so regressions in the strongest parity claims are visible
# (VERDICT r4 item 5):  make slow-gates | tee outputs/rN_slow_gates.txt
slow-gates:
	python -m pytest -m slow -q \
	  tests/test_reference_parity.py tests/test_ring_model.py \
	  tests/test_dgr_dp.py tests/test_train_eval_loop.py
