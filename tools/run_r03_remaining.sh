#!/bin/bash
# Remaining MAROS_r03 chunks (TPU) + final merge.  Chunked on purpose:
# a monolithic run once crashed the tunneled TPU worker; each chunk is
# an independent artifact and the merge recomputes the summary.
# Run from /root/repo when the axon tunnel is healthy.
set -ex

# --cg-max-iter 1500 bounds the indirect backend's inner loop: the
# unbounded cap (n+m ~ 2.5e4) stretches a fused 2000-iteration segment
# past the TPU worker's tolerance on the L instances (see 0026844).
python tools/run_maros_mm.py --only CVXQP1_L,CVXQP2_L,CVXQP3_L \
    --cg-max-iter 1500 --out MAROS_r03_L.json
python tools/run_maros_mm.py --only POWELL20,DTOC3 \
    --out MAROS_r03_pd.json
python tools/run_maros_mm.py --only LISWET9,LISWET12 \
    --out MAROS_r03_l2.json
python tools/run_maros_mm.py --only HS118,HS268,S268 \
    --out MAROS_r03_hs.json

python tools/merge_maros_chunks.py MAROS_r03.json \
    MAROS_r03_small.json MAROS_r03_M.json MAROS_r03_aug2d.json \
    MAROS_r03_liswet.json MAROS_r03_L.json MAROS_r03_pd.json \
    MAROS_r03_l2.json MAROS_r03_hs.json
