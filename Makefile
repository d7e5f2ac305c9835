.PHONY: native test bench ci clean

# Fast-CPU profile (the reference's CI analog, rust.yml:18-66): forces the
# CPU backend (tests/conftest.py honors LASSO_TPU_PLATFORM before backend
# init), shrinks the masked-sumcheck buffers so XLA:CPU compiles stay
# tractable on this 1-core host, and runs a syntax gate first.  Runnable
# entirely off-TPU.
#
# One pytest process PER TEST FILE (nextest-style process isolation): the
# XLA:CPU compiler segfaults intermittently under sustained compile load on
# this host, so each file gets a fresh compiler state while the persistent
# compile cache (lasso_tpu/__init__.py) keeps warm reruns cheap.
ci:
	python -m compileall -q lasso_tpu tests bench.py __graft_entry__.py
	@set -e; for f in tests/test_*.py; do \
		echo "== $$f"; \
		LASSO_TPU_PLATFORM=cpu LASSO_TPU_SUMCHECK_FIX=64 \
			python -m pytest $$f -x -q; \
	done

native: lasso_tpu/native/_libhostcrypto.so

lasso_tpu/native/_libhostcrypto.so: native/host_crypto.cpp
	g++ -O3 -march=native -shared -fPIC $< -o $@

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

clean:
	rm -f lasso_tpu/native/_libhostcrypto.so
