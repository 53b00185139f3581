"""Round-5 'next' #4: collective-traffic accounting for the 2-host
scaling target.

Compiles (never runs) the production train step on the virtual
(data x model) mesh and parses the SPMD-partitioned HLO for
all-reduce / all-gather / reduce-scatter / collective-permute bytes per
mesh axis. Combined with link bandwidths this turns BASELINE.md's
">= 80% efficiency at 2 hosts" into arithmetic (table lands in PERF.md).

Bandwidth assumptions (public numbers, stated not measured):
  * v5e ICI: 4 links x 100 GB/s/dir ~ 400 GB/s aggregate per chip;
    conservatively 100 GB/s for one-axis ring traffic.
  * DCN: 200 Gbps NIC per host ~ 25 GB/s.
Compute reference: 206 ms/step measured on the chip (PERF.md).
"""
import sys

sys.path.insert(0, "/root/repo")

import json

import __graft_entry__ as g

out = g.collective_traffic(8, full_shapes=False)
print(json.dumps({k: v for k, v in out.items()}, indent=1, default=int))

# the DCN-crossing term is the DATA-axis gradient all-reduce payload
# (the recipe freezes DICL, so only the depth-net grads psum — measured
# from the HLO, NOT the full param count). Ring all-reduce: EVERY ring
# edge carries ~2P(N-1)/N bytes; at 2 hosts the ring has 2 inter-host
# edges, each riding DCN.
P = out["data"].get("all-reduce", 0)
model_act = sum(out["model"].values())
print(f"data-axis grad allreduce payload P = {P/1e6:.1f} MB "
      f"(depth-net grads; flow frozen per recipe)")
print(f"model-axis activation collectives = {model_act/1e6:.1f} MB "
      f"(all-to-all/permute halos — laid INSIDE a host, ICI only)")
for hosts, chips in ((1, 8), (2, 16)):
    N = chips
    edge = 2 * P * (N - 1) / N
    t_ici = edge / 100e9
    t_dcn = (edge / 25e9) if hosts > 1 else 0.0
    t_comm = max(t_ici, t_dcn)
    t_step = 0.206
    eff = t_step / (t_step + t_comm)
    print(f"hosts={hosts} chips={chips}: ring-edge bytes "
          f"{edge/1e6:.1f} MB, t_ici {t_ici*1e3:.2f} ms, t_dcn "
          f"{t_dcn*1e3:.2f} ms -> predicted efficiency {eff:.1%} "
          f"(no-overlap worst case; XLA overlaps grad psum with "
          f"backward in practice)")
