"""Mutation-fuzz every pure-Python media decoder at the public API
boundary: ONLY (ValueError, NotImplementedError) may escape — anything
else is the job-killer class that evades the per-item skip allowlist
(see multimodal._malformed_to_valueerror) — and no single decode may
exceed the 5 s watchdog (poison-pill DoS: corrupted size/count/dim
fields driving unbounded loops or multi-GB allocations).

Round-5 findings, all fixed: PNG zlib.error escape; MKV EBML-vint
IndexError on truncation; TIFF IFD count DoS (+ dim bomb); GIF
logical-screen/frame dim bombs; JPEG SOF dim bomb (shields MJPEG
AVI/MKV); AVI LIST size-past-payload scan spin; AIFF ext80 exponent
OverflowError; plus boundary normalization of parse accidents. A review
pass then found the DELETION mutation was a no-op (`del b[i:][:n]`
deletes from a slice copy) — with real truncation mutations enabled and
the GIF aggregate-pixel budget + tightened JPEG/TIFF caps in place, the
final record is 27,000 mutations across the format seeds, 0 escapes,
0 slow.

Run: python tools/fuzz_decoders.py   (~8 min)
"""
import random, signal, sys
sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__file__), ".."))
sys.setrecursionlimit(1100)
import numpy as np
from marginaliasearch_spark.operators import multimodal as mm

rng = random.Random(99)
img = np.arange(16*16*3, dtype=np.uint8).reshape(16,16,3)
pcm = (np.sin(np.arange(800)/10)*3000).astype(np.int16)
idx = (np.arange(256, dtype=np.uint8).reshape(16,16) % 8)
pal = (np.arange(24, dtype=np.uint8).reshape(8,3) * 10)
coeffs = np.zeros((2,2,3,64), np.int64); coeffs[...,0] = 5
qt = np.ones(64, np.int64) * 4

def mk(name, fn):
    try: return [(name, bytes(fn()))]
    except Exception as e:
        print("seed skip", name, type(e).__name__, str(e)[:60]); return []

S = []
S += mk("gif", lambda: mm.encode_gif(idx, pal))
S += mk("gif_anim", lambda: mm.encode_gif_animation([(0,0,idx)]*3, pal, (16,16), delays=[10]*3))
S += mk("jpeg", lambda: mm.encode_jpeg(coeffs, 16, 16, qt))
S += mk("jpeg_prog", lambda: mm.encode_jpeg_progressive(coeffs, 16, 16, qt))
S += mk("flac", lambda: mm.encode_flac(pcm, order=1))
S += mk("flac_st", lambda: mm.encode_flac_stereo(np.stack([pcm, -pcm], 1), order=1) if True else b"")
S += mk("wav_g711", lambda: mm.encode_wav_g711((np.arange(800)%256).astype(np.uint8), law="ulaw"))
S += mk("wav_adpcm", lambda: mm.encode_wav_ima_adpcm((np.arange(800)%16).astype(np.uint8), 0, 0))
S += mk("avi", lambda: mm.encode_avi_mjpeg([mm.encode_jpeg(coeffs, 16, 16, qt)]*3, fps=10, w=16, h=16))
S += mk("mpeg", lambda: mm.encode_mpeg_stream(1, 20, 0, [3]*20, True, "t"))
S += mk("opus", lambda: mm.encode_ogg_opus(1, 10, 2, 312, "t", [40]*10))
S += mk("ppm", lambda: mm.encode_ppm(img) if hasattr(mm, "encode_ppm") else (_ for _ in ()).throw(AttributeError()))
S += mk("bmp", lambda: mm.encode_bmp(img) if hasattr(mm, "encode_bmp") else (_ for _ in ()).throw(AttributeError()))
S += mk("aiff_sowt", lambda: mm.encode_aiff(pcm, compression=b"sowt") if True else b"")
print("seeds:", [n for n, _ in S])

class Timeout(Exception): pass
signal.signal(signal.SIGALRM, lambda s, f: (_ for _ in ()).throw(Timeout()))
DEC = ["decode_image","decode_audio","decode_video"]
META = [d for d in ("mpeg_audio_meta","opus_meta","audio_meta") if hasattr(mm, d)]
bad = slow = total = 0
esc = {}
for name, payload in S:
    for trial in range(300):
        b = bytearray(payload)
        for _ in range(rng.randint(1, 6)):
            op = rng.random()
            if op < 0.5 and len(b) > 1:
                b[rng.randrange(len(b))] = rng.randrange(256)
            elif op < 0.75 and len(b) > 8:
                i = rng.randrange(len(b) - 4)
                del b[i : i + rng.randint(1, 4)]
            else:
                pos = rng.randrange(len(b)+1)
                b[pos:pos] = bytes(rng.randrange(256) for _ in range(rng.randint(1,4)))
        mut = bytes(b)
        for dec in DEC + META:
            total += 1
            signal.alarm(5)
            try:
                getattr(mm, dec)(mut)
            except (ValueError, NotImplementedError):
                pass
            except Timeout:
                slow += 1
                fn = f"/tmp/fuzz_slow_{name}_{trial}_{dec}.bin"
                open(fn, "wb").write(mut)
                print("SLOW", name, trial, dec)
            except Exception as e:
                key = (name, dec, type(e).__name__)
                bad += 1
                if esc.setdefault(key, 0) == 0:
                    fn = f"/tmp/fuzz_esc_{name}_{trial}_{dec}.bin"
                    open(fn, "wb").write(mut)
                    print("ESCAPE", name, dec, type(e).__name__, str(e)[:70], fn)
                esc[key] += 1
            finally:
                signal.alarm(0)
print(f"{total} attempts, {bad} escapes, {slow} slow")
for k, v in sorted(esc.items(), key=lambda t: -t[1]): print(v, k)
