# Build/test entry points — the PGXS-Makefile analogue (reference
# Makefile:1-65: `make && make installcheck && make prove_installcheck`).
# The library itself is pure Python + one C codec compiled on demand
# (pgvector_tpu/native/codec.cpp via ctypes); `make native` prebuilds it.

PYTHON ?= python

.PHONY: all test test-slow bench native clean

all: native

native:
	$(PYTHON) -c "from pgvector_tpu import native; print(native.load())"

# fast suite on the virtual 8-device CPU mesh (tests/conftest.py pins it)
test:
	$(PYTHON) -m pytest tests/ -x -q

# reference-contract gates (10k-row recall floors) included
test-slow:
	$(PYTHON) -m pytest tests/ -x -q -m slow

bench:
	$(PYTHON) bench.py

clean:
	rm -rf build dist *.egg-info pgvector_tpu/native/*.so
