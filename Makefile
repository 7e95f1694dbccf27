# Test recipes. The full suite is compile-heavy (~30 min on a 1-CPU box);
# the fast set (~12-15 min) still touches every subsystem — the slow marks
# cover only redundant-but-deeper variants (overfit convergence, the real
# two-process cluster, full TFLite conversion, remat grads, the fused-joint
# full-step A/B, offline WER eval). See pyproject [tool.pytest.ini_options].

.PHONY: test test-slow test-all

test:
	python -m pytest tests/ -q -m "not slow"

test-slow:
	python -m pytest tests/ -q -m "slow"

test-all:
	python -m pytest tests/ -q
