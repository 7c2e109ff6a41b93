"""Dump a readable architecture trace of each reference graph.

Usage: JAX_PLATFORMS=cpu python scripts/dump_arch.py [det|cls|rec] [> file]
"""

import sys

sys.path.insert(0, ".")

import jax
import numpy as np

from ppocr_tpu.paddle_compat import load_program
from ppocr_tpu.paddle_compat.executor import build_forward, init_random_params

FEEDS = {
    "det": (1, 3, 64, 96),
    "cls": (1, 3, 48, 192),
    "rec": (1, 3, 48, 320),
}


def main(name: str):
    prog = load_program(f"/root/reference/models/{name}/inference.pdmodel")
    params = init_random_params(prog)
    lines = []

    def hook(op, in_shapes, out_shapes):
        t = op.type
        if t in ("conv2d", "depthwise_conv2d", "conv2d_transpose"):
            w = op.input("Filter")[0]
            wshape = next(
                tuple(int(d) for d in v.tensor.dims)
                for v in prog.persistable_vars()
                if v.name == w
            )
            lines.append(
                f"{t:22s} w={wshape} s={op.attr('strides')} p={op.attr('paddings')} "
                f"g={op.attr('groups')} in={in_shapes[-1]} out={out_shapes[0]}  [{op.output('Output')[0]}]"
            )
        elif t in ("matmul_v2",):
            lines.append(
                f"{t:22s} tx={op.attr('trans_x')} ty={op.attr('trans_y')} ins={in_shapes} out={out_shapes[0]}  [{op.output('Out')[0]}]"
            )
        elif t in ("pool2d",):
            lines.append(
                f"{t:22s} {op.attr('pooling_type')} k={op.attr('ksize')} s={op.attr('strides')} "
                f"adaptive={op.attr('adaptive')} in={in_shapes[0]} out={out_shapes[0]}"
            )
        elif t in ("layer_norm", "softmax", "transpose2", "reshape2", "concat",
                   "nearest_interp_v2", "slice", "flatten_contiguous_range",
                   "squeeze2", "scale", "hard_swish", "hard_sigmoid", "relu",
                   "swish", "sigmoid", "elementwise_add", "elementwise_mul",
                   "batch_norm"):
            extra = ""
            if t == "transpose2":
                extra = f" axis={op.attr('axis')}"
            if t == "elementwise_add" and len(in_shapes) == 2 and in_shapes[0] == in_shapes[1] and len(in_shapes[0]) >= 3:
                extra = " (RESIDUAL?)"
            lines.append(f"{t:22s} ins={in_shapes} out={out_shapes[0]}{extra}")

    fwd = build_forward(prog, trace_hook=hook)
    jax.eval_shape(
        fwd,
        {k: jax.ShapeDtypeStruct(v.shape, v.dtype) for k, v in params.items()},
        {"x": jax.ShapeDtypeStruct(FEEDS[name], np.float32)},
    )
    print(f"### {name} ({len(lines)} traced ops)")
    print("\n".join(lines))


if __name__ == "__main__":
    for n in sys.argv[1:] or ["det", "cls", "rec"]:
        main(n)
