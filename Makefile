# Convenience targets (the package itself is pure Python + a lazily-built
# C++ shared library; see pyproject.toml for installation).

PY ?= python

.PHONY: all test test-fast bench bench-quick native clean

all: native test

# Full suite (CPU, simulated 8-device mesh via tests/conftest.py)
test:
	$(PY) -m pytest tests/ -q

# Everything except the slow Pallas interpret-mode warmup + scale goldens
test-fast:
	$(PY) -m pytest tests/ -q --ignore=tests/test_pallas.py -m "not slow"

# 17-query Performance-suite sweep (reference protocol)
sweep:
	$(PY) bench.py --full

# Headline benchmark on the default platform (one JSON line)
bench:
	$(PY) bench.py

bench-quick:
	$(PY) bench.py --quick

# Build the native host library eagerly (otherwise built lazily on import)
native:
	$(PY) -c "from swtpu import native; assert native.available(), 'native build failed'"

clean:
	rm -f swtpu/native/libswnative.so
	find . -name __pycache__ -type d -exec rm -rf {} +
