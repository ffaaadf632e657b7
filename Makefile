PYTHON ?= python

.PHONY: native test test-fast bench bench-streaming train-synth test-synth \
	clean

native:
	g++ -O3 -shared -fPIC eventad_tpu/native/evio.cpp \
		-o eventad_tpu/native/libevio.so

test:
	$(PYTHON) -m pytest tests/ -q

test-fast:
	$(PYTHON) -m pytest tests/ -q -x -k "not detector and not streaming"

bench:
	$(PYTHON) bench.py

bench-streaming:
	$(PYTHON) bench_streaming.py

train-synth:
	$(PYTHON) train.py --synthetic_data true \
		--dataset_directory ./data/synth --epochs 5 --output_dir ./output

test-synth:
	$(PYTHON) test.py --synthetic_data true \
		--dataset_directory ./data/synth --output_dir ./output

clean:
	rm -f eventad_tpu/native/libevio.so
	find . -name __pycache__ -type d | xargs rm -rf
