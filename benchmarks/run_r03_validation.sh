#!/bin/bash
# Round-3 TPU validation runbook — run when the axon tunnel is healthy.
# One TPU process at a time, one compile-heavy config per process, each
# under its own generous timeout (a SIGTERM mid-compile wedges the
# tunnel ~20 min, so timeouts are far above expected durations).
# Logs to benchmarks/r03_logs/; probes append to r03_rates.jsonl.
set -u
cd "$(dirname "$0")/.."
LOG=benchmarks/r03_logs
mkdir -p $LOG
RATES=$LOG/r03_rates.jsonl

step() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  echo "  rc=$rc"; tail -3 "$LOG/$name.log" | sed 's/^/  /'
  sleep 5
}

# 0. tunnel health
step probe 180 python -c "import jax, jax.numpy as jnp; print('ok', float((jnp.ones((256,256))@jnp.ones((256,256)))[0,0]))"
grep -q ok $LOG/probe.log || { echo "TUNNEL DOWN - aborting"; exit 1; }

# 1. headline bench (new interleaved-probe accounting, bf16 headline)
step bench 2400 python bench.py

# 2. case C2 repro (masked-fori + CG nest) — gates the CG default flip
step repro_c2 600 python benchmarks/repro_nested.py C2

# 3. AO-ADMM rates: chol (regression guard) then cg (the unfence target)
step ao_admm_chol 1800 python benchmarks/rate_probe.py ao_admm_chol $RATES
step ao_admm_cg 1800 python benchmarks/rate_probe.py ao_admm_cg $RATES

# 4. single-pass EU kernel: auto vs manual-DMA, bf16 then f32
step sweep_dma_bf16 2400 python benchmarks/sweep_dma.py --dtype bf16
step sweep_dma_f32 2400 python benchmarks/sweep_dma.py --dtype f32

# 5. HALS at headline scale (sweep kernel vs round-2's 99 it/s), then
#    the single-pass variant (one X read per outer iteration)
step hals_headline 1800 python benchmarks/rate_probe.py hals_headline $RATES
step hals_fori 1800 python benchmarks/rate_probe.py hals_headline_fori $RATES
step hals_single_pass 1800 python benchmarks/rate_probe.py hals_single_pass_headline $RATES
step mur_eu_headline 1800 python benchmarks/rate_probe.py mur_eu_headline $RATES

# 6. masked MUR at headline scale (fused kernels vs dense MUR)
step masked_eu 1800 python benchmarks/rate_probe.py masked_eu_headline $RATES
step masked_kl 1800 python benchmarks/rate_probe.py masked_kl_headline $RATES

# 7. out-of-core streaming with bf16 transfer
step streaming 2400 python benchmarks/bench_streaming.py

# 8. round-3 additions: tensor CP and l2,1 robust rates
step ntf_mur 1800 python benchmarks/rate_probe.py ntf_headline_mur $RATES
step ntf_hals 1800 python benchmarks/rate_probe.py ntf_headline_hals $RATES
step robust 1800 python benchmarks/rate_probe.py robust_headline $RATES

echo "=== done ($(date +%H:%M:%S)) ==="
