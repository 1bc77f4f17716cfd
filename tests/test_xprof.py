"""utils/xprof.py — trace parsing units (no TPU needed).

The self-time stack and the compiled-HLO fusion index are pure parsing;
pin them on synthetic protos/text. The real-trace path was validated on
a v5e capture (BASELINE.md 'where the step time actually goes').
"""

import gzip

import pytest

tf_proto = pytest.importorskip(
    "tensorflow.tsl.profiler.protobuf.xplane_pb2")


def _event(line, mid, offset_ps, duration_ps):
    ev = line.events.add()
    ev.metadata_id = mid
    ev.offset_ps = offset_ps
    ev.duration_ps = duration_ps


def test_self_times_nested_flame():
    from vln_hamt_tpu.utils.xprof import _self_times

    plane = tf_proto.XPlane()
    line = plane.lines.add()
    # parent [0, 100) covering child A [10, 40) and child B [50, 80);
    # sibling C [100, 130) outside the parent
    _event(line, 1, 0, 100)
    _event(line, 2, 10, 30)
    _event(line, 3, 50, 30)
    _event(line, 4, 100, 30)
    selfs = {mid: s for mid, s, _ in _self_times(line.events)}
    assert selfs[1] == 40  # 100 - 30 - 30
    assert selfs[2] == 30 and selfs[3] == 30 and selfs[4] == 30


def test_self_times_deep_nesting():
    from vln_hamt_tpu.utils.xprof import _self_times

    plane = tf_proto.XPlane()
    line = plane.lines.add()
    _event(line, 1, 0, 100)   # while
    _event(line, 2, 0, 100)   # body (same span: child by sort order)
    _event(line, 3, 20, 50)   # op inside body
    out = _self_times(line.events)
    total = sum(s for _, s, _ in out)
    assert total == 100  # self times partition the root span
    selfs = {}
    for mid, s, _ in out:
        selfs[mid] = selfs.get(mid, 0) + s
    assert selfs[3] == 50 and selfs[2] == 50 and selfs[1] == 0


_HLO = """\
HloModule jit__il_update_fn, entry_computation_layout={()->()}

%fused_computation.1 (p0: bf16[8,8]) -> bf16[8,8] {
  %p0 = bf16[8,8]{1,0:T(8,128)(2,1)} parameter(0)
  %convolution.5 = bf16[8,8]{1,0} convolution(bf16[8,8]{1,0} %p0, bf16[8,8]{1,0} %p0), dim_labels=bf_io->bf
  ROOT %add.3 = bf16[8,8]{1,0} add(bf16[8,8]{1,0} %convolution.5, bf16[8,8]{1,0} %p0)
}

%fused_computation.2 (p0.1: f32[4]) -> f32[4] {
  %p0.1 = f32[4]{0} parameter(0)
  ROOT %multiply.7 = f32[4]{0} multiply(f32[4]{0} %p0.1, f32[4]{0} %p0.1)
}

%wide.region_0.88 (arg_tuple: (s32[], bf16[8,8])) -> (s32[], bf16[8,8]) {
  %convert_reduce_fusion = bf16[8,8]{1,0:T(8,128)(2,1)} fusion(bf16[8,8]{1,0} %x), kind=kOutput, calls=%fused_computation.1
  %vpu_fusion.9 = f32[4]{0} fusion(f32[4]{0} %y), kind=kLoop, calls=%fused_computation.2
  %rng-bit-generator.1 = u32[4]{0} rng-bit-generator(u32[2]{0} %key), algorithm=rng_default
  %copy.44 = bf16[8,8]{1,0:T(8,128)(2,1)} copy(bf16[8,8]{1,0} %x)
}

ENTRY %main.52 (args: bf16[8,8]) -> bf16[8,8] {
  %while.21 = (s32[]{:T(128)}, bf16[8,8]{1,0}) while((s32[], bf16[8,8]) %t), condition=%cond, body=%wide.region_0.88
}
"""


def test_hlo_index_categorizes_by_fusion_contents(tmp_path):
    from vln_hamt_tpu.utils.xprof import load_hlo_index

    path = tmp_path / "mod.txt.gz"
    with gzip.open(path, "wt") as f:
        f.write(_HLO)
    idx = load_hlo_index(str(path))
    # fusion NAMED like a reduce but CONTAINING a convolution -> MXU
    assert idx["convert_reduce_fusion"] == "matmul (MXU)"
    assert idx["vpu_fusion.9"] == "elementwise/reduce (VPU)"
    assert idx["rng-bit-generator.1"] == "rng"
    assert idx["copy.44"] == "data movement"
    assert idx["while.21"] == "loop/control"
    # stripped-name fallback (unambiguous)
    assert idx["vpu_fusion"] == "elementwise/reduce (VPU)"


def test_analyze_reports_missing_trace(tmp_path):
    from vln_hamt_tpu.utils.xprof import analyze

    assert "error" in analyze(str(tmp_path))
