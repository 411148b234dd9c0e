import time, jax
from __graft_entry__ import _mixer_graph
from firewheel_tpu.parallel import BatchRenderer
program = _mixer_graph(block=128)
SR=48000
for B, K in [(8192, 128), (16384, 64)]:
    br = BatchRenderer(program, batch=B)
    params, state = br.stack_params(), br.init_state()
    t0=time.time()
    out, om, state = br.render_chunk(params, state, num_blocks=K); jax.block_until_ready(out)
    print(f"B={B} K={K}: compile+run {time.time()-t0:.1f}s", flush=True)
    best = 0
    for t in range(3):
        t0=time.time(); outs=[]
        for i in range(8):
            out, om, state = br.render_chunk(params, state, start_sample=(i+1)*K*128, num_blocks=K)
            outs.append(out)
        jax.block_until_ready(outs)
        rt = 8*B*K*128/SR/(time.time()-t0); best=max(best,rt)
        print(f"  trial {t}: {rt:.0f}x", flush=True)
