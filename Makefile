# Convenience targets. Native library builds automatically on first import;
# `make native` forces it.

.PHONY: test bench serve native train sweep clean

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

serve:
	python -m fav_tpu.serving.app

native:
	g++ -O3 -march=native -shared -fPIC fav_tpu/native/src/jpegio.cpp -ljpeg \
	    -o fav_tpu/native/libfavnative.so

train:
	python -m fav_tpu.models.pretrain

sweep:
	python -m fav_tpu.models.evaluate --out sweep_results.json

clean:
	rm -rf .jax_cache fav_tpu/native/libfavnative.so uploads
	find . -name __pycache__ -type d -exec rm -rf {} +
