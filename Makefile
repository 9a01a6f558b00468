# Convenience targets for the rssync_tpu framework.

.PHONY: all native test bench clean

all: native

native:
	$(MAKE) -C native/gpmf

test: native
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	$(MAKE) -C native/gpmf clean
	find . -name __pycache__ -type d -exec rm -rf {} +
