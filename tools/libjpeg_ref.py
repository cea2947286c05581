"""Reference arithmetic-JPEG encoder driving the SYSTEM libjpeg-turbo
(``libjpeg.so.62``) via ctypes — validation ground truth for the pure
arithmetic decoder in ``multimodal/codecs.py``.

Why this exists: an arithmetic encoder/decoder pair written together
would be self-consistent even if the probability model were wrong.  A
bitstream produced by an INDEPENDENT implementation (libjpeg's
jcarith.c) is the external check.  Only the standard system library is
used — nothing is installed.

Run as a SUBPROCESS (fatal libjpeg errors call exit(); isolation keeps
the test runner alive):

    python tools/libjpeg_ref.py encode <w> <h> <quality> <gray|rgb> \
        <out.jpg> < raw_pixels
    python tools/libjpeg_ref.py aritab          # dump jpeg_aritab rows

raw_pixels on stdin: w*h bytes (gray) or w*h*3 bytes (RGB, interleaved).
The emitted JPEG defaults to SEQUENTIAL ARITHMETIC (SOF9), 4:4:4 for
RGB; ``encode(..., progressive=True)`` emits progressive arithmetic
(SOF10) via jpeg_simple_progression, and ``arith=False`` the Huffman
twins used as decode ground truth.
"""

from __future__ import annotations

import ctypes as C
import sys

LIB = "libjpeg.so.62"
JPEG_LIB_VERSION = 62

JCS_GRAYSCALE = 1
JCS_RGB = 2


class jpeg_error_mgr(C.Structure):
    _fields_ = [("opaque", C.c_ubyte * 1024)]  # real struct ~168B; padded


def _compress_fields():
    """struct jpeg_compress_struct, libjpeg v62 ABI (jpeglib.h)."""
    return [
        ("err", C.c_void_p),
        ("mem", C.c_void_p),
        ("progress", C.c_void_p),
        ("client_data", C.c_void_p),
        ("is_decompressor", C.c_int),
        ("global_state", C.c_int),
        ("dest", C.c_void_p),
        ("image_width", C.c_uint),
        ("image_height", C.c_uint),
        ("input_components", C.c_int),
        ("in_color_space", C.c_int),
        ("input_gamma", C.c_double),
        ("data_precision", C.c_int),
        ("num_components", C.c_int),
        ("jpeg_color_space", C.c_int),
        ("comp_info", C.c_void_p),
        ("quant_tbl_ptrs", C.c_void_p * 4),
        ("dc_huff_tbl_ptrs", C.c_void_p * 4),
        ("ac_huff_tbl_ptrs", C.c_void_p * 4),
        ("arith_dc_L", C.c_ubyte * 16),
        ("arith_dc_U", C.c_ubyte * 16),
        ("arith_ac_K", C.c_ubyte * 16),
        ("num_scans", C.c_int),
        ("scan_info", C.c_void_p),
        ("raw_data_in", C.c_int),
        ("arith_code", C.c_int),
        ("optimize_coding", C.c_int),
        ("CCIR601_sampling", C.c_int),
        ("smoothing_factor", C.c_int),
        ("dct_method", C.c_int),
        ("restart_interval", C.c_uint),
        ("restart_in_rows", C.c_int),
        ("write_JFIF_header", C.c_int),
        ("JFIF_major_version", C.c_ubyte),
        ("JFIF_minor_version", C.c_ubyte),
        ("density_unit", C.c_ubyte),
        ("X_density", C.c_ushort),
        ("Y_density", C.c_ushort),
        ("write_Adobe_marker", C.c_int),
        ("next_scanline", C.c_uint),
        ("progressive_mode", C.c_int),
        ("max_h_samp_factor", C.c_int),
        ("max_v_samp_factor", C.c_int),
        ("total_iMCU_rows", C.c_uint),
        ("comps_in_scan", C.c_int),
        ("cur_comp_info", C.c_void_p * 4),
        ("MCUs_per_row", C.c_uint),
        ("MCU_rows_in_scan", C.c_uint),
        ("blocks_in_MCU", C.c_int),
        ("MCU_membership", C.c_int * 10),
        ("Ss", C.c_int),
        ("Se", C.c_int),
        ("Ah", C.c_int),
        ("Al", C.c_int),
        ("master", C.c_void_p),
        ("main", C.c_void_p),
        ("prep", C.c_void_p),
        ("coef", C.c_void_p),
        ("marker", C.c_void_p),
        ("cconvert", C.c_void_p),
        ("downsample", C.c_void_p),
        ("fdct", C.c_void_p),
        ("entropy", C.c_void_p),
        ("script_space", C.c_void_p),
        ("script_space_size", C.c_int),
    ]


class jpeg_compress_struct(C.Structure):
    _fields_ = _compress_fields()


def _lib():
    lib = C.CDLL(LIB)
    lib.jpeg_std_error.restype = C.c_void_p
    lib.jpeg_std_error.argtypes = [C.POINTER(jpeg_error_mgr)]
    return lib


def encode(
    w: int,
    h: int,
    quality: int,
    mode: str,
    raw: bytes,
    arith: bool = True,
    restart_rows: int = 0,
    subsamp: str = "444",
    progressive: bool = False,
) -> bytes:
    lib = _lib()
    jerr = jpeg_error_mgr()
    cinfo = jpeg_compress_struct()
    cinfo.err = lib.jpeg_std_error(C.byref(jerr))
    lib.jpeg_CreateCompress(
        C.byref(cinfo), JPEG_LIB_VERSION, C.sizeof(jpeg_compress_struct)
    )
    outbuf = C.c_void_p(None)
    outsize = C.c_ulong(0)
    lib.jpeg_mem_dest(C.byref(cinfo), C.byref(outbuf), C.byref(outsize))
    cinfo.image_width = w
    cinfo.image_height = h
    if mode == "gray":
        cinfo.input_components = 1
        cinfo.in_color_space = JCS_GRAYSCALE
        row_stride = w
    else:
        cinfo.input_components = 3
        cinfo.in_color_space = JCS_RGB
        row_stride = w * 3
    lib.jpeg_set_defaults(C.byref(cinfo))
    lib.jpeg_set_quality(C.byref(cinfo), quality, 1)
    cinfo.arith_code = 1 if arith else 0
    cinfo.restart_in_rows = restart_rows
    if mode == "rgb" and subsamp == "444":
        # force 4:4:4: comp_info[0].h/v_samp_factor = 1.  Find the
        # component stride empirically: defaults set (id=1, idx=0,
        # h=2, v=2) then (id=2, idx=1, h=1, v=1).
        # layout per component: [component_id, component_index(set at
        # start_compress), h_samp, v_samp, quant_tbl_no, dc_tbl_no,
        # ac_tbl_no, ...]; stride found by locating component 2's
        # (id=2, h=1, v=1) signature.
        base = cinfo.comp_info
        ints = C.cast(base, C.POINTER(C.c_int))
        assert ints[0] == 1 and ints[2] == 2 and ints[3] == 2, (
            ints[0], ints[1], ints[2], ints[3]
        )
        stride_ints = None
        for s in range(8, 64):
            if ints[s] == 2 and ints[s + 2] == 1 and ints[s + 3] == 1:
                stride_ints = s
                break
        assert stride_ints, "comp_info stride not found"
        ints[2] = 1  # h_samp
        ints[3] = 1  # v_samp
    if progressive:
        lib.jpeg_simple_progression(C.byref(cinfo))
    lib.jpeg_start_compress(C.byref(cinfo), 1)
    rowptr = (C.c_void_p * 1)()
    buf = C.create_string_buffer(raw, len(raw))
    while cinfo.next_scanline < cinfo.image_height:
        rowptr[0] = C.cast(
            C.byref(buf, cinfo.next_scanline * row_stride), C.c_void_p
        )
        lib.jpeg_write_scanlines(C.byref(cinfo), rowptr, 1)
    lib.jpeg_finish_compress(C.byref(cinfo))
    data = C.string_at(outbuf, outsize.value)
    lib.jpeg_destroy_compress(C.byref(cinfo))
    return data


def dump_aritab() -> list[int]:
    """The packed T.81 Table D.3 exactly as the library stores it
    (JLONG = 8-byte entries on LP64)."""
    lib = _lib()
    tab = C.cast(lib.jpeg_aritab, C.POINTER(C.c_int64))
    return [tab[i] for i in range(114)]


def main() -> None:
    cmd = sys.argv[1]
    if cmd == "aritab":
        print(",".join(str(v) for v in dump_aritab()))
        return
    if cmd == "encode":
        w, h, q = int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
        mode, out = sys.argv[5], sys.argv[6]
        raw = sys.stdin.buffer.read()
        need = w * h * (1 if mode == "gray" else 3)
        assert len(raw) == need, (len(raw), need)
        data = encode(w, h, q, mode, raw)
        with open(out, "wb") as fh:
            fh.write(data)
        print(len(data))
        return
    raise SystemExit(f"unknown command {cmd}")


if __name__ == "__main__":
    main()


def _decompress_fields():
    """struct jpeg_decompress_struct, libjpeg v62 ABI (jpeglib.h) —
    fields up to output state; the tail (internal pointers) is padded
    since jpeg_CreateDecompress validates total size only."""
    return [
        ("err", C.c_void_p),
        ("mem", C.c_void_p),
        ("progress", C.c_void_p),
        ("client_data", C.c_void_p),
        ("is_decompressor", C.c_int),
        ("global_state", C.c_int),
        ("src", C.c_void_p),
        ("image_width", C.c_uint),
        ("image_height", C.c_uint),
        ("num_components", C.c_int),
        ("jpeg_color_space", C.c_int),
        ("out_color_space", C.c_int),
        ("scale_num", C.c_uint),
        ("scale_denom", C.c_uint),
        ("output_gamma", C.c_double),
        ("buffered_image", C.c_int),
        ("raw_data_out", C.c_int),
        ("dct_method", C.c_int),
        ("do_fancy_upsampling", C.c_int),
        ("do_block_smoothing", C.c_int),
        ("quantize_colors", C.c_int),
        ("dither_mode", C.c_int),
        ("two_pass_quantize", C.c_int),
        ("desired_number_of_colors", C.c_int),
        ("enable_1pass_quant", C.c_int),
        ("enable_external_quant", C.c_int),
        ("enable_2pass_quant", C.c_int),
        ("output_width", C.c_uint),
        ("output_height", C.c_uint),
        ("out_color_components", C.c_int),
        ("output_components", C.c_int),
        ("rec_outbuf_height", C.c_int),
        ("actual_number_of_colors", C.c_int),
        ("colormap", C.c_void_p),
        ("output_scanline", C.c_uint),
        ("input_scan_number", C.c_int),
        ("input_iMCU_row", C.c_uint),
        ("output_scan_number", C.c_int),
        ("output_iMCU_row", C.c_uint),
        ("coef_bits", C.c_void_p),
        ("quant_tbl_ptrs", C.c_void_p * 4),
        ("dc_huff_tbl_ptrs", C.c_void_p * 4),
        ("ac_huff_tbl_ptrs", C.c_void_p * 4),
        ("data_precision", C.c_int),
        ("comp_info", C.c_void_p),
        ("progressive_mode", C.c_int),
        ("arith_code", C.c_int),
        ("arith_dc_L", C.c_ubyte * 16),
        ("arith_dc_U", C.c_ubyte * 16),
        ("arith_ac_K", C.c_ubyte * 16),
        ("restart_interval", C.c_uint),
        ("saw_JFIF_marker", C.c_int),
        ("JFIF_major_version", C.c_ubyte),
        ("JFIF_minor_version", C.c_ubyte),
        ("density_unit", C.c_ubyte),
        ("X_density", C.c_ushort),
        ("Y_density", C.c_ushort),
        ("saw_Adobe_marker", C.c_int),
        ("Adobe_transform", C.c_ubyte),
        ("CCIR601_sampling", C.c_int),
        ("marker_list", C.c_void_p),
        ("max_h_samp_factor", C.c_int),
        ("max_v_samp_factor", C.c_int),
        ("min_DCT_scaled_size", C.c_int),
        ("total_iMCU_rows", C.c_uint),
        ("sample_range_limit", C.c_void_p),
        ("comps_in_scan", C.c_int),
        ("cur_comp_info", C.c_void_p * 4),
        ("MCUs_per_row", C.c_uint),
        ("MCU_rows_in_scan", C.c_uint),
        ("blocks_in_MCU", C.c_int),
        ("MCU_membership", C.c_int * 10),
        ("Ss", C.c_int),
        ("Se", C.c_int),
        ("Ah", C.c_int),
        ("Al", C.c_int),
        ("unread_marker", C.c_int),
        ("master", C.c_void_p),
        ("main", C.c_void_p),
        ("coef", C.c_void_p),
        ("post", C.c_void_p),
        ("inputctl", C.c_void_p),
        ("marker", C.c_void_p),
        ("entropy", C.c_void_p),
        ("idct", C.c_void_p),
        ("upsample", C.c_void_p),
        ("cquantize", C.c_void_p),
        # one more pointer-sized slot than the field list above — the
        # v62 tail is internal module pointers, so padding the END is
        # safe as long as every field we touch sits in the (verified)
        # head; decode() asserts parsed header values look sane.
        ("_pad_tail", C.c_void_p),
    ]


class jpeg_decompress_struct(C.Structure):
    _fields_ = _decompress_fields()


def decode(data: bytes, force_gray: bool) -> tuple[int, int, int, bytes]:
    lib = _lib()
    jerr = jpeg_error_mgr()
    cinfo = jpeg_decompress_struct()
    cinfo.err = lib.jpeg_std_error(C.byref(jerr))
    lib.jpeg_CreateDecompress(
        C.byref(cinfo), JPEG_LIB_VERSION, C.sizeof(jpeg_decompress_struct)
    )
    buf = C.create_string_buffer(data, len(data))
    lib.jpeg_mem_src(C.byref(cinfo), buf, len(data))
    lib.jpeg_read_header(C.byref(cinfo), 1)
    if force_gray:
        cinfo.out_color_space = JCS_GRAYSCALE
    cinfo.dct_method = 1  # JDCT_IFAST? no: 0=ISLOW,1=IFAST,2=FLOAT
    cinfo.dct_method = 0  # ISLOW for determinism
    lib.jpeg_start_decompress(C.byref(cinfo))
    w, h, ncomp = cinfo.output_width, cinfo.output_height, cinfo.output_components
    stride = w * ncomp
    out = bytearray(h * stride)
    rowbuf = C.create_string_buffer(stride)
    rowptr = (C.c_void_p * 1)()
    rowptr[0] = C.cast(rowbuf, C.c_void_p)
    while cinfo.output_scanline < h:
        y = cinfo.output_scanline
        lib.jpeg_read_scanlines(C.byref(cinfo), rowptr, 1)
        out[y * stride : (y + 1) * stride] = rowbuf.raw[:stride]
    lib.jpeg_finish_decompress(C.byref(cinfo))
    lib.jpeg_destroy_decompress(C.byref(cinfo))
    return w, h, ncomp, bytes(out)
