"""Re-test compiler-dependent NEGATIVE results on the current compiler
(round-4 VERDICT ask #7; the round-4 fused-act-quant win came precisely
from re-testing a round-2 negative after a compiler change — see memory of
the int8-dot shift).

Three experiments, each in its own subprocess (trace-time switches):
  1. in-kernel cache-write attention vs XLA dynamic-update-slice
     (ops/pallas/experimental.py; negative in rounds 2-4)
  2. BF16_BF16_F32_X3 pixel-conv mode vs f32-HIGHEST / bf16
     (tools/bench_pixels.py variants)
  3. fused act-quant row gate MIN_FUSED_ROWS sweep on the d30 W8A8+INT8-KV
     decode (round-4 optimum: 4096)

Prints one line per experiment for BENCHMARKS.md.
"""
from __future__ import annotations

import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, env=None, timeout=1800):
    e = dict(os.environ)
    if env:
        e.update(env)
    r = subprocess.run([sys.executable] + cmd, cwd=ROOT, env=e,
                       capture_output=True, text=True, timeout=timeout)
    out = r.stdout + r.stderr
    if r.returncode != 0:
        print(f"[retest] FAILED {' '.join(cmd)}:\n{out[-2000:]}", flush=True)
    return out


def main():
    # 1. cache-write kernel A/B (W8A8 + INT8-KV decode, the serving config)
    for ck in (0, 1):
        out = run(["tools/ab_cache_write.py", "--kv", "int8", "--w8a8",
                   "--cache-kernel", str(ck)])
        m = re.findall(r"\[ab\].*ms/batch.*", out)
        print(f"[retest] cache_kernel={ck}: "
              f"{m[-1] if m else 'NO OUTPUT'}", flush=True)

    # 2. X3 conv mode (bench_pixels prints all variants; keep 3 lines)
    out = run(["tools/bench_pixels.py", "16", "4"])
    for name in ("nhwc-f32 ", "nhwc-f32-3x", "nhwc-bf16", "nhwc-w8a8",
                 "nhwc-w8a8-calib"):
        m = [l for l in out.splitlines() if f"] {name}" in l]
        if m:
            print("[retest] " + m[-1].strip(), flush=True)

    # 3. MIN_FUSED_ROWS gate sweep (0 = fuse everywhere; 1<<30 = never)
    code = ("import bench; v=bench.bench_decode(30,16,w8a8=True,"
            "kv_mode='int8'); print(f'IPS={v:.3f}')")
    for rows in ("0", "2048", "3200", "4096", str(1 << 30)):
        out = run(["-c", code], env={"SDVAR_MIN_FUSED_ROWS": rows})
        m = re.findall(r"IPS=([\d.]+)", out)
        mm = re.findall(r"ms/batch", out)
        ms = re.findall(r"(\d+\.\d+) ms/batch", out)
        print(f"[retest] min_fused_rows={rows}: "
              f"{m[-1] if m else 'FAIL'} img/s "
              f"({ms[-1] if ms else '?'} ms/batch)", flush=True)


if __name__ == "__main__":
    main()
