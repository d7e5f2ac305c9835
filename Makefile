.PHONY: native test bench clean

native: lasso_tpu/native/_libhostcrypto.so

lasso_tpu/native/_libhostcrypto.so: native/host_crypto.cpp
	g++ -O3 -march=native -shared -fPIC $< -o $@

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

clean:
	rm -f lasso_tpu/native/_libhostcrypto.so
