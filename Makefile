# Build the native host library (generator / host partitioner / scheduler)
# and run the test suite. The Python package builds the .so lazily too;
# this target is for explicit/CI builds.

NATIVE_DIR := icde2019_gpu_join_tpu/datagen/native
SO := $(NATIVE_DIR)/libtpujoin_host.so

.PHONY: all native test bench tpu-smoke clean

all: native

native: $(SO)

$(SO): $(NATIVE_DIR)/host_engine.cpp
	g++ -O3 -shared -fPIC -fopenmp -mavx2 -o $@ $< || \
	g++ -O3 -shared -fPIC -fopenmp -o $@ $<

test: native
	python -m pytest tests/ -x -q

bench: native
	python bench.py

# On-device gate: every Pallas path + all five configs at small scale on
# the REAL chip. Run before any headline/PROGRESS claim (the CPU-only test
# suite cannot see device-only breakage).
tpu-smoke: native
	python benchmarks/tpu_smoke.py

clean:
	rm -f $(SO)
