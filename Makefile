# Build the native host-side helpers (ctypes-loaded; everything degrades
# gracefully to NumPy when absent).
CXX ?= g++
CXXFLAGS ?= -O3 -march=native -fopenmp -fPIC -shared -std=c++17

native: concept_tpu/_native.so

concept_tpu/_native.so: csrc/ewald.cpp
	$(CXX) $(CXXFLAGS) $< -o $@

test:
	python -m pytest tests/ -q

clean:
	rm -f concept_tpu/_native.so
	find . -name __pycache__ -type d -exec rm -rf {} +

.PHONY: native test clean
