#!/bin/bash
# Remaining MAROS_r03 chunks (TPU) + final merge.  Chunked on purpose:
# a monolithic run once crashed the tunneled TPU worker; each chunk is
# an independent artifact and the merge recomputes the summary.  Cheap
# chunks run first so a crash on the large instances doesn't lose them.
# Run from /root/repo when the axon tunnel is healthy.
set -ex

python tools/run_maros_mm.py --only YAO --out MAROS_r03_yao.json
python tools/run_maros_mm.py --only POWELL20 --cg-max-iter 1500 \
    --out MAROS_r03_powell.json
python tools/run_maros_mm.py --only LISWET9,LISWET12 \
    --out MAROS_r03_l2.json
python tools/run_maros_mm.py --only HS118,HS268,S268 \
    --out MAROS_r03_hs.json
python tools/run_maros_mm.py --only AUG2DC --out MAROS_r03_aug2dc.json

# The two heavyweights, each its own artifact.  --cg-max-iter 1500
# bounds the indirect backend's inner loop; the segmented driver
# additionally adapts dispatch duration (batch.py _ADAPT_*) so no
# single device program outruns the worker watchdog.
python tools/run_maros_mm.py --only DTOC3 --cg-max-iter 1500 \
    --out MAROS_r03_dtoc3.json
python tools/run_maros_mm.py --only CVXQP1_L,CVXQP2_L,CVXQP3_L \
    --cg-max-iter 1500 --out MAROS_r03_L.json

python tools/merge_maros_chunks.py MAROS_r03.json \
    MAROS_r03_small.json MAROS_r03_M.json MAROS_r03_aug2d.json \
    MAROS_r03_liswet.json MAROS_r03_yao.json MAROS_r03_powell.json \
    MAROS_r03_l2.json MAROS_r03_hs.json MAROS_r03_aug2dc.json \
    MAROS_r03_dtoc3.json MAROS_r03_L.json
