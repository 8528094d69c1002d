# Build all native components (auto-built on first use by their ctypes
# shims; this target just builds them eagerly).
.PHONY: native clean test

native:
	$(MAKE) -C cpp/pmc
	$(MAKE) -C cpp/kernelmap
	$(MAKE) -C cpp/gcransac

clean:
	$(MAKE) -C cpp/pmc clean
	$(MAKE) -C cpp/kernelmap clean
	$(MAKE) -C cpp/gcransac clean

test:
	python -m pytest tests/ -q
