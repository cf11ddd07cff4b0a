# Workload orchestration (behavioral contract: reference Makefile:3-20).
#
# The reference downloads a 7.9-minute 3-band sky recording and runs the
# full acquire/track workload through the external packet2wav_3ch demuxer.
# Quirks fixed here (documented, not silently inherited): the reference's
# `track` target names a script that does not exist
# (track-all-gnss-2017-0427-L1L2L5.sh vs the actual file, Makefile:14).

DATA = gnss-20170427-L1L2L5.pcap
URL = https://rf-waveforms.s3.amazonaws.com/$(DATA)

all: test

$(DATA):
	curl -O $(URL)

acquire: $(DATA)
	./acquire-all.sh $(DATA)

track: $(DATA)
	./track-all-gnss-2017-L1L2L5.sh $(DATA)

test:
	python -m pytest tests/ -q -m "" -n 4

bench:
	python bench.py

# End-to-end validation against the REAL sky recording: checksum the
# capture, run the batched acquire-all + track-all workload, and diff
# every result against the reference's own golden seeds
# (track-all-gnss-2017-L1L2L5.sh:9-25).  Network-gated: the pcap download
# needs egress; without the file the target explains and exits 3.  The
# synthetic stand-in equivalent (runs anywhere) is `make verify-synth`.
verify:
	python tools/run_sky_workload.py --real --batched $(DATA)

verify-synth:
	python tools/run_sky_workload.py --batched

.PHONY: all acquire track test bench verify verify-synth
