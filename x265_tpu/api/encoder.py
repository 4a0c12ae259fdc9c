"""Top-level encoder API (x265_encoder_open/encode/close analog,
reference source/encoder/api.cpp:76,410 and encoder.cpp:1574).

Round-1 scope: all-intra (I slices only), lossless (transquant bypass) and
CQP transform paths, single slice per picture, Annex-B output.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from x265_tpu.api.params import Param, check_params
from x265_tpu.engine.ctu_writer import FrameDecisions, FrameSyntaxWriter
from x265_tpu.engine.mode_decision import decide_intra_frame
from x265_tpu.hevc.bitstream import (
    annexb, make_nal, NAL_IDR_W_RADL, NAL_TRAIL_R, NAL_VPS, NAL_SPS, NAL_PPS,
)
from x265_tpu.hevc.headers import (
    PPS, SPS, VPS, ProfileTierLevel, ShortTermRPS, SliceHeader,
    SLICE_I, SLICE_P,
    write_pps, write_sps, write_vps, write_slice_header,
)


def _level_for(width: int, height: int, fps: float) -> int:
    """Pick a general_level_idc (spec A.4 main-tier luma sample limits)."""
    ls = width * height
    rate = ls * fps
    table = [  # (level_idc, MaxLumaPs, MaxLumaSr)
        (30, 36864, 552960), (60, 122880, 3686400), (63, 245760, 7372800),
        (90, 552960, 16588800), (93, 983040, 33177600),
        (120, 2228224, 66846720), (123, 2228224, 133693440),
        (150, 8912896, 267386880), (153, 8912896, 534773760),
        (156, 8912896, 1069547520), (180, 35651584, 1069547520),
        (183, 35651584, 2139095040), (186, 35651584, 4278190080),
    ]
    for idc, max_ps, max_sr in table:
        if ls <= max_ps and rate <= max_sr:
            return idc
    return 186


class Encoder:
    def __init__(self, param: Param):
        self.param = check_params(param.copy())
        p = self.param
        fps = p.fps_num / max(1, p.fps_den)
        ptl = ProfileTierLevel(
            profile_idc=2 if p.bit_depth == 10 else 1,
            tier_flag=1 if p.high_tier else 0,
            level_idc=p.level_idc or _level_for(p.width, p.height, fps),
        )
        # IPPP GOP (config #2): one negative reference, no reordering
        self.ipp = p.keyint != 1
        rps = ([ShortTermRPS(num_negative=1, delta_poc_s0=[-1],
                             used_s0=[True])] if self.ipp else [])
        dpb = 2 if self.ipp else 1
        self.vps = VPS(max_dec_pic_buffering=dpb, num_reorder_pics=0, ptl=ptl)
        self.sps = SPS(
            chroma_format_idc=1,
            width=p.width, height=p.height,
            bit_depth=p.bit_depth,
            log2_max_poc_lsb=8,
            max_dec_pic_buffering=dpb,
            num_reorder_pics=0,
            short_term_rps=rps,
            log2_min_cb=p.min_cb_log2,
            log2_diff_max_min_cb=p.ctb_log2 - p.min_cb_log2,
            log2_min_tb=2,
            log2_diff_max_min_tb=min(p.ctb_log2, 5) - 2,
            max_transform_hierarchy_depth_inter=p.tu_inter_depth - 1,
            max_transform_hierarchy_depth_intra=p.tu_intra_depth - 1,
            amp_enabled=p.amp,
            sao_enabled=p.sao,
            strong_intra_smoothing=p.intra_smoothing,
            vui_present=p.vui_timing_info,
            fps_num=p.fps_num, fps_den=p.fps_den,
            ptl=ptl,
        )
        self.pps = PPS(
            sign_data_hiding=p.sign_hide and not p.lossless,
            init_qp=26,
            cb_qp_offset=p.cb_qp_offset,
            cr_qp_offset=p.cr_qp_offset,
            transquant_bypass_enabled=p.lossless,
            deblocking_filter_control_present=(
                not p.deblock or p.deblock_beta_offset != 0
                or p.deblock_tc_offset != 0),
            deblocking_filter_disabled=not p.deblock,
            beta_offset_div2=p.deblock_beta_offset,
            tc_offset_div2=p.deblock_tc_offset,
            loop_filter_across_slices=True,
        )
        self.poc = 0
        self.frame_count = 0
        # analysis backend: batched TPU graph by default; numpy reference
        # path retained for differential testing (engine.mode_decision)
        self.use_tpu_analysis = True
        # entropy backend: native C++ finalizer when buildable; Python
        # reference writer is the oracle (differential-tested)
        self.use_native = True

    # -- public API --

    def headers(self) -> bytes:
        """x265_encoder_headers analog: VPS/SPS/PPS as one Annex-B chunk."""
        return annexb([
            make_nal(NAL_VPS, write_vps(self.vps)),
            make_nal(NAL_SPS, write_sps(self.sps)),
            make_nal(NAL_PPS, write_pps(self.pps)),
        ])

    def encode_frame(self, y: np.ndarray, cb: np.ndarray,
                     cr: np.ndarray,
                     decisions: Optional[FrameDecisions] = None) -> bytes:
        """Encode one picture -> Annex-B access unit bytes (slice NAL)."""
        p = self.param
        assert y.shape == (p.height, p.width), y.shape
        is_idr = (self.frame_count == 0 or
                  (p.keyint > 0 and self.frame_count % p.keyint == 0) or
                  getattr(self, "_last_recon", None) is None)
        if is_idr:
            self.poc = 0
            return self._encode_intra_frame(y, cb, cr, decisions)
        return self._encode_p_frame(y, cb, cr, decisions)

    def _encode_intra_frame(self, y, cb, cr, decisions=None) -> bytes:
        p = self.param
        sh = SliceHeader(first_slice_in_pic=True, slice_type=SLICE_I, qp=p.qp)
        if decisions is None:
            decisions = self._intra_decisions(y)
        slice_data = None
        if self.use_native:
            from x265_tpu import native
            res = native.encode_slice_intra(
                np.asarray(y), np.asarray(cb), np.asarray(cr),
                decisions.cu_log2_map, decisions.luma_mode8,
                decisions.chroma_mode8,
                p.ctb_log2, p.min_cb_log2, p.qp, p.lossless,
                self.pps.sign_data_hiding, p.intra_smoothing,
                p.cb_qp_offset, p.cr_qp_offset, want_recon=True)
            if res is not None:
                slice_data, recon = res
                self._last_recon = self._deblock_intra_recon(recon, decisions)
        if slice_data is None:
            writer = FrameSyntaxWriter(self.sps, self.pps, sh, p.lossless)
            slice_data = writer.encode_slice_data(
                np.asarray(y), np.asarray(cb), np.asarray(cr), decisions)
            writer.apply_loop_filters()
            self._last_recon = (writer.y, writer.cb, writer.cr)
        hdr_bw = write_slice_header(sh, self.sps, self.pps, NAL_IDR_W_RADL)
        nal = make_nal(NAL_IDR_W_RADL, hdr_bw.data() + slice_data)
        self.poc += 1
        self.frame_count += 1
        return annexb([nal])

    def _deblock_intra_recon(self, recon, decisions):
        """Deblock the recon returned by the native intra finalizer.

        All-intra ⇒ bS=2 at every CU(==TU/PU) boundary on the 8-grid
        regardless of cbf (spec 8.7.2.4), so the edge maps derive from the
        CU-size map alone."""
        p = self.param
        if not p.deblock or p.lossless:
            return recon
        from x265_tpu.hevc.deblock import DeblockState, deblock_frame
        h, w = p.height, p.width
        h4, w4 = (h + 3) // 4, (w + 3) // 4
        cl4 = np.repeat(np.repeat(decisions.cu_log2_map, 2, 0),
                        2, 1)[:h4, :w4]
        st = DeblockState(h, w)
        xs = (np.arange(w4) * 4)[None, :]
        ys = (np.arange(h4) * 4)[:, None]
        st.edge_v = (xs % (1 << cl4)) == 0
        st.edge_h = (ys % (1 << cl4)) == 0
        is_intra4 = np.ones((h4, w4), dtype=bool)
        yy, cbb, crr = deblock_frame(
            recon[0].astype(np.int32), recon[1].astype(np.int32),
            recon[2].astype(np.int32), st, is_intra4, None, None,
            p.qp, p.deblock_beta_offset, p.deblock_tc_offset,
            p.cb_qp_offset, p.cr_qp_offset, p.bit_depth)
        return yy, cbb, crr

    def _intra_decisions(self, y) -> FrameDecisions:
        p = self.param
        cu_log2 = 4 if p.ctb_log2 >= 4 else p.ctb_log2
        if self.use_tpu_analysis:
            from x265_tpu.models.intra_frame import decide_intra_frame_tpu
            return decide_intra_frame_tpu(
                np.asarray(y), p.width, p.height, cu_log2=cu_log2)
        return decide_intra_frame(
            np.asarray(y), p.width, p.height, p.ctb_log2, cu_log2=cu_log2,
            strong_smoothing=p.intra_smoothing, bit_depth=p.bit_depth)

    def _encode_p_frame(self, y, cb, cr, decisions=None) -> bytes:
        p = self.param
        sh = SliceHeader(
            first_slice_in_pic=True,
            slice_type=SLICE_P,
            qp=p.qp,
            pic_order_cnt_lsb=self.poc & 0xFF,
            rps_in_sps=True,
            short_term_rps_idx=0,
            max_num_merge_cand=2,
        )
        if decisions is None:
            decisions = self._p_decisions(y)
        writer = FrameSyntaxWriter(self.sps, self.pps, sh, p.lossless,
                                   ref_planes=self._last_recon)
        slice_data = writer.encode_slice_data(
            np.asarray(y), np.asarray(cb), np.asarray(cr), decisions)
        writer.apply_loop_filters()
        self._last_recon = (writer.y, writer.cb, writer.cr)
        hdr_bw = write_slice_header(sh, self.sps, self.pps, NAL_TRAIL_R)
        nal = make_nal(NAL_TRAIL_R, hdr_bw.data() + slice_data)
        self.poc += 1
        self.frame_count += 1
        return annexb([nal])

    def _p_decisions(self, y) -> FrameDecisions:
        """Inter/intra split + MVs for a P frame (TPU ME + intra bank)."""
        from x265_tpu.engine.me import motion_decide
        from x265_tpu.models.intra_frame import (
            decide_intra_frame_tpu, frame_intra_analysis)
        import jax.numpy as jnp

        p = self.param
        S = 16
        dec = self._intra_decisions(y)       # modes + cu map (incl boundary)
        ref_y = self._last_recon[0]
        mv_blk, mcost = motion_decide(
            np.asarray(y), np.asarray(ref_y), p.width, p.height, S=S,
            R=p.me_range if p.me_range <= 24 else 16, qp=p.qp,
            subme=p.sub_me)
        # intra costs on the same padded grid (both SATD + bit-bias domain)
        ph = -(-p.height // S) * S
        pw = -(-p.width // S) * S
        yp = np.pad(np.asarray(y, dtype=np.int32),
                    ((0, ph - p.height), (0, pw - p.width)), mode="edge")
        _, icost = frame_intra_analysis(jnp.asarray(yp), S=S)
        icost = np.asarray(icost).reshape(ph // S, pw // S)
        inter_blk = mcost < icost
        h8, w8 = p.height >> 3, p.width >> 3
        rep = S >> 3
        inter8 = np.repeat(np.repeat(inter_blk, rep, 0), rep, 1)[:h8, :w8]
        mv8 = np.repeat(np.repeat(mv_blk, rep, 0), rep, 1)[:h8, :w8]
        dec.inter8 = np.ascontiguousarray(inter8)
        dec.mv8 = np.ascontiguousarray(mv8)
        return dec

    def encode(self, frames) -> bytes:
        """Encode an iterable of (y, cb, cr) frames; returns full stream."""
        out = [self.headers()]
        for (y, cb, cr) in frames:
            out.append(self.encode_frame(y, cb, cr))
        return b"".join(out)
