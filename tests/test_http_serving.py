"""HTTP serving front-end tests (tiny model, CPU, loopback sockets).

Streams are driven through real HTTP: stdlib client against the stdlib
ThreadingHTTPServer, with the device work on the single driver thread.
"""

import http.client
import json
import threading

import pytest

from fish_tts_tpu.testing import make_tiny_tts


@pytest.fixture(scope="module")
def server():
    import numpy as np

    from fish_tts_tpu import VoiceProfile
    from fish_tts_tpu.serving.http import make_server

    tts = make_tiny_tts()
    gura = VoiceProfile(
        codes=np.random.RandomState(0).randint(
            0, 24, (tts._cfg.num_codebooks, 6)).astype(np.int64),
        text="tiny reference transcript", name="gura",
    )
    srv, driver = make_server(tts, host="127.0.0.1", port=0, slots=2,
                              max_queue=8, voices={"gura": gura})
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address, tts
    driver.close()
    srv.shutdown()


def _post(addr, body, timeout=120):
    conn = http.client.HTTPConnection(*addr, timeout=timeout)
    conn.request("POST", "/synthesize", json.dumps(body),
                 {"Content-Type": "application/json"})
    return conn


def test_synthesize_streams_pcm(server):
    addr, tts = server
    conn = _post(addr, {"text": "http hello", "max_new_tokens": 24,
                        "seed": 5})
    resp = conn.getresponse()
    assert resp.status == 200
    assert resp.headers["Content-Type"] == "audio/L16"
    assert int(resp.headers["X-Sample-Rate"]) == \
        tts._vocoder_cfg.sample_rate
    pcm = resp.read()
    conn.close()
    fl = tts._vocoder_cfg.frame_length
    assert len(pcm) > 0 and len(pcm) % (2 * fl) == 0  # whole int16 frames


def test_concurrent_requests_share_the_pool(server):
    """Two HTTP requests in flight at once: both stream to completion and
    each matches a direct ServeSession run with the same seed."""
    addr, tts = server

    def direct(text, seed, max_new):
        sess = tts.serve(slots=2)
        rid = sess.submit(text, max_new_tokens=max_new, seed=seed)
        buf = bytearray()
        for ev in sess.run():
            if ev.request_id == rid:
                buf.extend(ev.pcm)
        return bytes(buf)

    want = {i: direct(f"concurrent {i}", 40 + i, 20 + 4 * i)
            for i in range(2)}
    got = {}

    def fetch(i):
        conn = _post(addr, {"text": f"concurrent {i}", "seed": 40 + i,
                            "max_new_tokens": 20 + 4 * i})
        got[i] = conn.getresponse().read()
        conn.close()

    threads = [threading.Thread(target=fetch, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert got[0] == want[0] and got[1] == want[1]


def test_stats_and_health(server):
    addr, _ = server
    conn = http.client.HTTPConnection(*addr, timeout=60)
    conn.request("GET", "/healthz")
    assert json.loads(conn.getresponse().read())["ok"] is True
    conn.request("GET", "/stats")
    st = json.loads(conn.getresponse().read())
    assert st["slots"] == 2 and "completed" in st
    conn.close()


def test_cancel_endpoint_ends_stream(server):
    addr, _ = server
    conn = _post(addr, {"text": "cancel over http", "max_new_tokens": 600,
                        "seed": 51})
    resp = conn.getresponse()
    rid = int(resp.headers["X-Request-Id"])
    first = resp.read(4)  # wait until the stream is live
    c2 = http.client.HTTPConnection(*addr, timeout=60)
    c2.request("DELETE", f"/requests/{rid}")
    assert json.loads(c2.getresponse().read())["cancelled"] == rid
    c2.close()
    rest = resp.read()  # chunked stream must END (not hang) after cancel
    conn.close()
    assert len(first) + len(rest) < 600 * 2 * 2048


def test_wav_format_streams_playable_riff(server):
    """format=wav prepends the unknown-length RIFF header; the payload
    after the 44-byte header equals the pcm run of the same seed."""
    addr, _ = server
    body = {"text": "wav please", "max_new_tokens": 12, "seed": 13}
    conn = _post(addr, dict(body, format="wav"))
    r = conn.getresponse()
    assert r.headers["Content-Type"] == "audio/wav"
    wav = r.read()
    conn.close()
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE" and len(wav) > 44
    conn = _post(addr, body)
    pcm = conn.getresponse().read()
    conn.close()
    assert wav[44:] == pcm
    conn = _post(addr, dict(body, format="mp3"))
    assert conn.getresponse().status == 400
    conn.close()


def test_per_request_voice_over_http(server):
    """The 'voice' field selects a registry profile; audio differs from the
    voiceless run of the same seed (the references condition the prompt)
    and unknown voices 400 with the available list."""
    addr, _ = server
    body = {"text": "voice pick", "max_new_tokens": 16, "seed": 9}
    conn = _post(addr, dict(body, voice="gura"))
    voiced = conn.getresponse().read()
    conn.close()
    conn = _post(addr, body)
    plain = conn.getresponse().read()
    conn.close()
    assert len(voiced) > 0 and voiced != plain
    conn = _post(addr, dict(body, voice="nope"))
    r = conn.getresponse()
    assert r.status == 400
    assert json.loads(r.read())["voices"] == ["gura"]
    conn.close()
    conn = http.client.HTTPConnection(*addr, timeout=60)
    conn.request("GET", "/voices")
    assert json.loads(conn.getresponse().read())["voices"] == ["gura"]
    conn.close()


def test_put_voice_registers_and_conditions(server):
    """PUT /voices/<name> encodes reference audio through the codec encoder
    and the new voice is immediately usable on /synthesize."""
    import base64

    import numpy as np

    from fish_tts_tpu.utils.audio import to_wav_bytes

    addr, tts = server
    sr = tts._vocoder_cfg.sample_rate
    wav = to_wav_bytes(
        np.sin(np.linspace(0, 880 * np.pi, sr)).astype(np.float32) * 0.3, sr)
    conn = http.client.HTTPConnection(*addr, timeout=300)
    conn.request("PUT", "/voices/newvoice", json.dumps(
        {"wav_b64": base64.b64encode(wav).decode(), "text": "a ref"}))
    r = conn.getresponse()
    out = json.loads(r.read())
    assert r.status == 200 and out["voice"] == "newvoice"
    assert out["frames"] > 0
    conn.request("GET", "/voices")
    assert "newvoice" in json.loads(conn.getresponse().read())["voices"]
    conn.close()
    body = {"text": "with new voice", "max_new_tokens": 10, "seed": 23}
    conn = _post(addr, dict(body, voice="newvoice"))
    voiced = conn.getresponse().read()
    conn.close()
    assert len(voiced) > 0


def test_buffered_mode_returns_complete_wav(server):
    """stream=false buffers the request and returns one sized response; the
    WAV variant carries real RIFF sizes and its payload equals the
    streamed pcm run of the same seed."""
    addr, _ = server
    body = {"text": "buffered", "max_new_tokens": 10, "seed": 17}
    conn = _post(addr, dict(body, stream=False, format="wav"))
    r = conn.getresponse()
    wav = r.read()
    conn.close()
    assert r.headers.get("Content-Length") == str(len(wav))
    assert wav[:4] == b"RIFF"
    import struct
    assert struct.unpack("<I", wav[4:8])[0] == len(wav) - 8  # real size
    conn = _post(addr, body)
    pcm = conn.getresponse().read()
    conn.close()
    assert wav[-len(pcm):] == pcm


def test_driver_close_releases_inflight_consumers():
    """close() must end every in-flight stream (sentinel pushed) so no HTTP
    handler blocks forever; drain=True lets live requests finish first."""
    from fish_tts_tpu.serving.http import ServeDriver

    tts = make_tiny_tts()
    driver = ServeDriver(tts.serve(slots=1))
    rid, q = driver.submit("drain me", max_new_tokens=8, seed=21)
    driver.close(drain=True, timeout=300)
    chunks = []
    while True:
        item = q.get(timeout=10)  # must never hang
        if driver.is_done(item):
            break
        chunks.append(item)
    assert sum(len(c) for c in chunks) > 0  # drained to completion

    driver2 = ServeDriver(tts.serve(slots=1))
    rid2, q2 = driver2.submit("cut short", max_new_tokens=4000, seed=22)
    driver2.close(drain=False)  # fail fast: sentinel still delivered
    while True:
        item = q2.get(timeout=10)
        if driver2.is_done(item):
            break


def test_bad_body_and_unknown_path(server):
    addr, _ = server
    conn = http.client.HTTPConnection(*addr, timeout=60)
    # every malformed body must get a 400 RESPONSE, never a dead socket:
    for body in ("{}", "[1,2]", '"str"',
                 '{"text": "x", "temperature": "hot"}',
                 '{"text": "x", "priority": "high"}',
                 '{"text": "x", "seed": "abc"}'):
        conn.request("POST", "/synthesize", body,
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 400, body
        r.read()
    conn.request("PUT", "/voices/x", "[1]")
    r = conn.getresponse()
    assert r.status == 400
    r.read()
    conn.request("GET", "/nope")
    r = conn.getresponse()
    assert r.status == 404
    r.read()
    conn.close()


def test_deadline_expiry_ends_http_stream(server):
    """A running request whose timeout_s expires must END its HTTP stream
    (final done event through the session) — not wedge the slot queue or
    hang the consumer — and the slot must be reusable afterward."""
    addr, _ = server
    conn = _post(addr, {"text": "expires mid-decode", "max_new_tokens": 4000,
                        "seed": 33, "timeout_s": 2.0}, timeout=120)
    resp = conn.getresponse()
    pcm = resp.read()  # must terminate (not hang) once the deadline passes
    conn.close()
    assert len(pcm) < 4000 * 2 * 2048
    # slot is healthy: a normal request completes afterwards
    conn = _post(addr, {"text": "after expiry", "max_new_tokens": 8,
                        "seed": 34})
    r = conn.getresponse()
    out = r.read()
    conn.close()
    assert r.status == 200 and len(out) > 0


def test_openai_speech_endpoint_wav(server):
    """/v1/audio/speech with OpenAI field names returns one complete WAV
    (real RIFF sizes), with unknown stock voices falling back silently."""
    addr, tts = server
    conn = http.client.HTTPConnection(*addr, timeout=120)
    conn.request("POST", "/v1/audio/speech",
                 json.dumps({"model": "tts-1", "input": "openai hello",
                             "voice": "alloy", "seed": 7,
                             "max_new_tokens": 16}),
                 {"Content-Type": "application/json"})
    r = conn.getresponse()
    assert r.status == 200
    assert r.headers["Content-Type"] == "audio/wav"
    body = r.read()
    conn.close()
    assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
    # buffered mode: RIFF size fields are real, not the streaming sentinel
    import struct
    assert struct.unpack("<I", body[4:8])[0] == len(body) - 8


def test_openai_speech_endpoint_pcm_stream_and_registry_voice(server):
    addr, tts = server
    conn = http.client.HTTPConnection(*addr, timeout=120)
    conn.request("POST", "/v1/audio/speech",
                 json.dumps({"input": "pcm", "voice": "gura",
                             "response_format": "pcm", "seed": 8,
                             "max_new_tokens": 12}),
                 {"Content-Type": "application/json"})
    r = conn.getresponse()
    assert r.status == 200, r.read()
    assert r.headers["Content-Type"] == "audio/L16"
    assert int(r.headers["X-Sample-Rate"]) == tts._vocoder_cfg.sample_rate
    pcm = r.read()
    conn.close()
    fl = tts._vocoder_cfg.frame_length
    assert len(pcm) > 0 and len(pcm) % (2 * fl) == 0


def test_openai_speech_endpoint_rejections(server):
    addr, _ = server
    conn = http.client.HTTPConnection(*addr, timeout=60)
    for body in ('{"voice": "alloy"}',                      # no input
                 '{"input": "x", "response_format": "mp3"}',
                 '{"input": "x", "speed": 1.5}',
                 '{"input": "x", "stream_format": "sse"}'):
        conn.request("POST", "/v1/audio/speech", body,
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 400, body
        r.read()
    conn.close()


def test_prometheus_metrics_endpoint(server):
    addr, _ = server
    conn = http.client.HTTPConnection(*addr, timeout=60)
    conn.request("GET", "/metrics")
    r = conn.getresponse()
    assert r.status == 200
    assert r.headers["Content-Type"].startswith("text/plain")
    body = r.read().decode()
    conn.close()
    assert "fish_tts_queue_depth " in body
    assert "fish_tts_live_slots " in body
    # every sample line parses as "<name> <number>"
    for line in body.strip().splitlines():
        if line.startswith("#"):
            continue
        name, val = line.split(" ")
        assert name.startswith("fish_tts_")
        float(val)


def test_openai_error_envelope(server):
    """/v1/ error responses use OpenAI's {"error": {"message","type"}}
    envelope (stock SDKs read error.message/error.type)."""
    addr, _ = server
    conn = http.client.HTTPConnection(*addr, timeout=60)
    conn.request("POST", "/v1/audio/speech",
                 '{"input": "x", "response_format": "mp3"}',
                 {"Content-Type": "application/json"})
    r = conn.getresponse()
    assert r.status == 400
    err = json.loads(r.read())["error"]
    assert err["type"] == "invalid_request_error"
    assert "mp3" in err["message"]
    conn.close()


def test_buffered_mode_errors_on_no_audio(server):
    """A buffered request that ends without producing audio (deadline
    expired while queued) gets a 504 error, not a 200 with an empty
    file."""
    addr, _ = server
    # keep both slots AND the queue ahead of the buffered request occupied
    # long past its deadline (tiny config caps each generation at ~100
    # frames, so a single wave of blockers frees slots within ~100 ms)
    blockers = [_post(addr, {"text": f"blocker {i}", "max_new_tokens": 600,
                             "seed": 60 + i}) for i in range(4)]
    resps = [c.getresponse() for c in blockers[:2]]
    for r in resps:
        assert len(r.read(2)) == 2  # first two streams live -> slots taken
    conn = _post(addr, {"text": "expires queued", "max_new_tokens": 10,
                        "timeout_s": 0.02, "stream": False, "format": "wav"})
    r = conn.getresponse()
    assert r.status == 504
    assert "error" in json.loads(r.read())
    conn.close()
    # drain the blockers (tiny budgets: they all complete quickly)
    resps += [c.getresponse() for c in blockers[2:]]
    for c, r in zip(blockers, resps):
        r.read()
        c.close()


def test_driver_recovery_is_atomic_with_submit():
    """A submit racing the step-failure recovery must not fall into the gap
    between the consumer-dict swap and session.reset(): with the swap+reset
    under one lock hold, the racing submit blocks until the session is
    rebuilt and then serves normally (regression: its request was silently
    dropped by reset() while its consumer queue waited forever)."""
    import threading
    import time as _t

    from fish_tts_tpu.serving.http import ServeDriver
    from fish_tts_tpu.synthesizer import AudioEvent

    class FakeSession:
        def __init__(self):
            self.fail_next = True
            self.in_reset = threading.Event()
            self.release_reset = threading.Event()
            self.reset_done = threading.Event()
            self.epoch = 0
            self.enqueue_epoch = {}
            self.pending = []
            self.busy = True

        def prepare(self, text, **kw):
            return text

        def enqueue(self, req):
            rid = len(self.enqueue_epoch) + 1
            self.enqueue_epoch[rid] = self.epoch
            self.pending.append(rid)
            return rid

        def step(self):
            if self.fail_next:
                self.fail_next = False
                raise RuntimeError("injected device failure")
            if self.pending:
                rid = self.pending.pop(0)
                return [AudioEvent(rid, b"\x01\x02", True, 1)]
            _t.sleep(0.002)
            return []

        def reset(self):
            self.in_reset.set()
            assert self.release_reset.wait(5), "test never released reset"
            self.epoch += 1
            self.reset_done.set()

        def cancel(self, rid):
            pass

        def stats(self):
            return {}

    fake = FakeSession()
    drv = ServeDriver(fake, poll_idle_s=0.001)
    try:
        assert fake.in_reset.wait(5), "driver never hit the failure path"
        result = {}

        def racing_submit():
            result["rid"], result["q"] = drv.submit("late request")

        t = threading.Thread(target=racing_submit)
        t.start()
        _t.sleep(0.3)
        # the reset is still in progress: the submit must be blocked, not
        # enqueued into the session that reset() is about to wipe
        assert "rid" not in result and not fake.enqueue_epoch
        fake.release_reset.set()
        t.join(timeout=5)
        assert not t.is_alive()
        assert fake.enqueue_epoch[result["rid"]] == 1, \
            "request enqueued into the pre-reset session"
        # ... and it is served by the rebuilt session
        assert result["q"].get(timeout=5) == b"\x01\x02"
        assert drv.is_done(result["q"].get(timeout=5))
    finally:
        fake.release_reset.set()
        fake.busy = False
        drv.close(timeout=5)
