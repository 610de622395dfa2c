"""Audio tag extraction (ID3v1/v2, Vorbis comments, RIFF INFO).

Fixtures are hand-assembled from the published tag layouts — no
builder shared with the parser — covering the v2.2/2.3/2.4 frame
differences, all four ID3 text encodings, Vorbis comments in all
three homes (Ogg-Vorbis packet, native FLAC block, Ogg-FLAC header
packet), OpusTags, and the WAV LIST INFO chunk.
"""

from __future__ import annotations

import random
import struct

from travel_data_ingestion_spark.llm.tags import audio_tags


def _syncsafe(v: int) -> bytes:
    return bytes(((v >> s) & 0x7F) for s in (21, 14, 7, 0))


def _id3v23(frames: list[tuple[bytes, bytes]]) -> bytes:
    body = b"".join(
        fid + struct.pack(">I", len(data)) + b"\x00\x00" + data
        for fid, data in frames
    )
    return b"ID3\x03\x00\x00" + _syncsafe(len(body)) + body


def _id3v24(frames: list[tuple[bytes, bytes]]) -> bytes:
    body = b"".join(
        fid + _syncsafe(len(data)) + b"\x00\x00" + data
        for fid, data in frames
    )
    return b"ID3\x04\x00\x00" + _syncsafe(len(body)) + body


def test_id3v23_latin1_and_utf16():
    tag = _id3v23(
        [
            (b"TIT2", b"\x00My Title"),
            (b"TPE1", b"\x01" + "Artîst".encode("utf-16")),
            (b"TALB", b"\x03" + "Albûm".encode("utf-8")),
            (b"TYER", b"\x002001"),
        ]
    )
    got = audio_tags(tag + b"\xff\xfb" + bytes(100))
    assert got == {"title": "My Title", "artist": "Artîst",
                   "album": "Albûm", "date": "2001"}


def test_id3v24_syncsafe_sizes_and_utf16be():
    tag = _id3v24(
        [
            (b"TIT2", b"\x02" + "T24".encode("utf-16-be")),
            (b"TDRC", b"\x002026-08-16"),
        ]
    )
    got = audio_tags(tag)
    assert got["title"] == "T24" and got["date"] == "2026-08-16"


def test_id3v22_three_byte_frames():
    body = b"TT2" + (5).to_bytes(3, "big") + b"\x00Old2"
    body += b"TP1" + (3).to_bytes(3, "big") + b"\x00A2"
    tag = b"ID3\x02\x00\x00" + _syncsafe(len(body)) + body
    assert audio_tags(tag) == {"title": "Old2", "artist": "A2"}


def test_id3v1_trailer_fallback():
    t = b"TAG" + b"V1 Title".ljust(30, b"\x00") + b"V1 Artist".ljust(30, b"\x00")
    t += b"V1 Album".ljust(30, b"\x00") + b"1999" + bytes(28) + bytes(3)
    assert len(t) == 128
    payload = b"\xff\xfb" + bytes(400) + t
    got = audio_tags(payload)
    assert got == {"title": "V1 Title", "artist": "V1 Artist",
                   "album": "V1 Album", "date": "1999"}


def _vc_body(pairs: list[tuple[str, str]]) -> bytes:
    vendor = b"test"
    out = struct.pack("<I", len(vendor)) + vendor
    out += struct.pack("<I", len(pairs))
    for k, v in pairs:
        item = f"{k}={v}".encode()
        out += struct.pack("<I", len(item)) + item
    return out


def test_vorbis_comment_in_ogg_vorbis_stream():
    import numpy as np

    from tests.test_ogg import _mux
    from tests.test_vorbis import encode_pcm_mono

    pkts = encode_pcm_mono(np.zeros(256))
    pkts[1] = b"\x03vorbis" + _vc_body(
        [("TITLE", "Ogg Song"), ("ARTIST", "Enc Öder"), ("DATE", "2026")]
    ) + b"\x01"
    got = audio_tags(_mux(pkts, final_granule=128))
    assert got == {"title": "Ogg Song", "artist": "Enc Öder", "date": "2026"}


def test_vorbis_comment_in_native_flac():
    import numpy as np

    from tests.test_flac import _flac

    native = _flac(np.zeros((64, 1), dtype=np.int64), kind="constant")
    # splice a VORBIS_COMMENT block before the (last) STREAMINFO flips
    assert native[4] & 0x80  # STREAMINFO is last
    si = bytearray(native[4:42])
    si[0] &= 0x7F  # no longer last
    vc = _vc_body([("TITLE", "Flac Title"), ("GENRE", "noise")])
    block = bytes([0x84]) + len(vc).to_bytes(3, "big") + vc  # type 4, last
    patched = native[:4] + bytes(si) + block + native[42:]
    got = audio_tags(patched)
    assert got == {"title": "Flac Title", "genre": "noise"}


def test_vorbis_comment_in_ogg_flac_header_packet():
    import numpy as np

    from tests.test_flac import _flac
    from tests.test_ogg import _mux

    native = _flac(np.zeros((64, 1), dtype=np.int64), kind="constant")
    si = bytearray(native[4:42])
    si[0] &= 0x7F
    first = b"\x7fFLAC\x01\x00" + (1).to_bytes(2, "big") + b"fLaC" + bytes(si)
    vc = _vc_body([("ALBUM", "OggFlacAlbum")])
    hdr_pkt = bytes([0x84]) + len(vc).to_bytes(3, "big") + vc
    frames = native[42:]
    ogg = _mux([first, hdr_pkt, frames], final_granule=64)
    got = audio_tags(ogg)
    assert got == {"album": "OggFlacAlbum"}


def test_opus_tags():
    from tests.test_ogg import _mux

    head = (b"OpusHead" + bytes([1, 1]) + (0).to_bytes(2, "little")
            + (48000).to_bytes(4, "little") + b"\x00\x00\x00")
    tags = b"OpusTags" + _vc_body([("TITLE", "Opus T")])
    got = audio_tags(_mux([head, tags], final_granule=960))
    assert got == {"title": "Opus T"}


def test_riff_info_chunk():
    info = b"INAM" + struct.pack("<I", 8) + b"WavName\x00"
    info += b"IART" + struct.pack("<I", 7) + b"WavArt\x00"
    lst = b"LIST" + struct.pack("<I", 4 + len(info)) + b"INFO" + info
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 4) + bytes(4) + lst
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    got = audio_tags(wav)
    assert got == {"title": "WavName", "artist": "WavArt"}


def test_hostile_bytes_total():
    rng = random.Random(9)
    for n in (0, 3, 10, 128, 1000):
        blob = bytes(rng.randrange(256) for _ in range(n))
        for prefix in (b"", b"ID3", b"fLaC", b"OggS", b"RIFF", b"\xff\xfb"):
            assert isinstance(audio_tags(prefix + blob), dict)


def test_id3v23_unsynchronised_tag():
    # ID3v2.3 unsynchronisation (header flag 0x80) stuffs 0x00 after
    # 0xFF across the WHOLE tag body; a UTF-16 BOM (FF FE) in a text
    # frame is the common real-world trigger
    data = b"\x01" + "Uñsync".encode("utf-16")  # BOM-led, contains \xff
    body = b"TIT2" + len(data).to_bytes(4, "big") + b"\x00\x00" + data
    body += b"TPE1" + b"\x00\x00\x00\x03" + b"\x00\x00" + b"\x00A\xff"
    stuffed = body.replace(b"\xff", b"\xff\x00")
    assert stuffed != body  # the flag is actually exercised
    tag = b"ID3\x03\x00\x80" + _syncsafe(len(stuffed)) + stuffed
    got = audio_tags(tag + b"\xff\xfb" + bytes(64))
    assert got["title"] == "Uñsync"
    assert got["artist"] == "A\xff"


def test_id3v24_per_frame_unsync_flag():
    # v2.4 unsync is per-frame (format flag 0x02); the frame size is
    # the STORED (stuffed) size, syncsafe
    data = b"\x01" + "Tïtle".encode("utf-16")
    stuffed = data.replace(b"\xff", b"\xff\x00")
    frame = b"TIT2" + _syncsafe(len(stuffed)) + b"\x00\x02" + stuffed
    tag = b"ID3\x04\x00\x00" + _syncsafe(len(frame)) + frame
    assert audio_tags(tag)["title"] == "Tïtle"
    # tag-level flag in v2.4 means all frames are unsynchronised even
    # without the per-frame bit
    frame2 = b"TIT2" + _syncsafe(len(stuffed)) + b"\x00\x00" + stuffed
    tag2 = b"ID3\x04\x00\x80" + _syncsafe(len(frame2)) + frame2
    assert audio_tags(tag2)["title"] == "Tïtle"


def test_audio_tag_rows_batch_wrapper(spark):
    # the Spark-shaped wrapper: mapInPandas, tags out, payloads never
    # back to the JVM; None payload is total
    from travel_data_ingestion_spark.llm.tags import audio_tag_rows

    tag = _id3v23([(b"TIT2", b"\x00Row Title"), (b"TCON", b"\x00jazz")])
    df = spark.createDataFrame(
        [
            (1, bytearray(tag + b"\xff\xfb" + bytes(32))),
            (2, bytearray(b"not audio")),
            (3, None),
        ],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in audio_tag_rows(df).collect()}
    assert rows[1].container == "id3v2"
    assert rows[1].title == "Row Title" and rows[1].genre == "jazz"
    assert rows[2].container is None and rows[2].title is None
    assert rows[3].container is None and rows[3].title is None
