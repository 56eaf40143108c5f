install:
	python -m pip install -e . -q --no-deps --no-build-isolation

uninstall:
	python -m pip uninstall krisp-tpu

test:
	python -m pytest tests/ -q

bench:
	python bench.py
