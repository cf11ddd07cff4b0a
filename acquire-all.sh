#!/bin/sh
# Full-sky acquisition workload (behavioral contract: reference
# acquire-all.sh:9-35): 5 L1 + 7 L2 + 9 L5 acquisitions over the 3-band
# 69.984 MHz capture, demuxed by the external packet2wav_3ch tool
# (not shipped with the reference either).
#
# Quirk fixed (documented): the reference invokes acquire-glonass-l3i.py /
# -l3q.py, names that do not exist (the scripts are l3ocd/l3ocp).

DATA=$1
DEST_DIR=${2:-acq-out}
S=$(dirname "$0")/scripts
mkdir -p "${DEST_DIR}"

# L1 1584.754875 MHz
<"${DATA}" packet2wav_3ch 1 | python "$S"/acquire-gps-l1.py      /dev/stdin 69984000  -9334875 >"${DEST_DIR}"/acq-gps-l1.dat
<"${DATA}" packet2wav_3ch 1 | python "$S"/acquire-glonass-l1.py  /dev/stdin 69984000  17245125 >"${DEST_DIR}"/acq-glonass-l1.dat
<"${DATA}" packet2wav_3ch 1 | python "$S"/acquire-galileo-e1b.py /dev/stdin 69984000  -9334875 >"${DEST_DIR}"/acq-galileo-e1b.dat
<"${DATA}" packet2wav_3ch 1 | python "$S"/acquire-galileo-e1c.py /dev/stdin 69984000  -9334875 >"${DEST_DIR}"/acq-galileo-e1c.dat
<"${DATA}" packet2wav_3ch 1 | python "$S"/acquire-beidou-b1i.py  /dev/stdin 69984000 -23656875 >"${DEST_DIR}"/acq-beidou-b1i.dat

# L2 1227.727125 MHz
<"${DATA}" packet2wav_3ch 2 | python "$S"/acquire-gps-l2cm.py      /dev/stdin 69984000   -127126 >"${DEST_DIR}"/acq-gps-l2cm.dat
<"${DATA}" packet2wav_3ch 2 | python "$S"/acquire-glonass-l2.py    /dev/stdin 69984000  18272874 >"${DEST_DIR}"/acq-glonass-l2.dat
<"${DATA}" packet2wav_3ch 2 | python "$S"/acquire-glonass-l3ocd.py /dev/stdin 69984000 -25702126 >"${DEST_DIR}"/acq-glonass-l3ocd.dat
<"${DATA}" packet2wav_3ch 2 | python "$S"/acquire-glonass-l3ocp.py /dev/stdin 69984000 -25702126 >"${DEST_DIR}"/acq-glonass-l3ocp.dat
<"${DATA}" packet2wav_3ch 2 | python "$S"/acquire-galileo-e5bi.py  /dev/stdin 69984000 -20587126 >"${DEST_DIR}"/acq-galileo-e5bi.dat
<"${DATA}" packet2wav_3ch 2 | python "$S"/acquire-galileo-e5bq.py  /dev/stdin 69984000 -20587126 >"${DEST_DIR}"/acq-galileo-e5bq.dat
<"${DATA}" packet2wav_3ch 2 | python "$S"/acquire-beidou-b2i.py    /dev/stdin 69984000 -20587126 >"${DEST_DIR}"/acq-beidou-b2i.dat

# L5 1191.641625 MHz
<"${DATA}" packet2wav_3ch 3 | python "$S"/acquire-gps-l5i.py       /dev/stdin 69984000 -15191625 >"${DEST_DIR}"/acq-gps-l5i.dat
<"${DATA}" packet2wav_3ch 3 | python "$S"/acquire-gps-l5q.py       /dev/stdin 69984000 -15191625 >"${DEST_DIR}"/acq-gps-l5q.dat
<"${DATA}" packet2wav_3ch 3 | python "$S"/acquire-galileo-e5ai.py  /dev/stdin 69984000 -15191625 >"${DEST_DIR}"/acq-galileo-e5ai.dat
<"${DATA}" packet2wav_3ch 3 | python "$S"/acquire-galileo-e5aq.py  /dev/stdin 69984000 -15191625 >"${DEST_DIR}"/acq-galileo-e5aq.dat
<"${DATA}" packet2wav_3ch 3 | python "$S"/acquire-glonass-l3ocd.py /dev/stdin 69984000  10383375 >"${DEST_DIR}"/acq-glonass-l3ocd-ch3.dat
<"${DATA}" packet2wav_3ch 3 | python "$S"/acquire-glonass-l3ocp.py /dev/stdin 69984000  10383375 >"${DEST_DIR}"/acq-glonass-l3ocp-ch3.dat
<"${DATA}" packet2wav_3ch 3 | python "$S"/acquire-galileo-e5bi.py  /dev/stdin 69984000  15498375 >"${DEST_DIR}"/acq-galileo-e5bi-ch3.dat
<"${DATA}" packet2wav_3ch 3 | python "$S"/acquire-galileo-e5bq.py  /dev/stdin 69984000  15498375 >"${DEST_DIR}"/acq-galileo-e5bq-ch3.dat
<"${DATA}" packet2wav_3ch 3 | python "$S"/acquire-beidou-b2i.py    /dev/stdin 69984000  15498375 >"${DEST_DIR}"/acq-beidou-b2i-ch3.dat
