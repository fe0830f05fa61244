"""StorageLayer backends: the S3 primitive mapping (against an
in-memory fake client enforcing real S3 semantics — conditional PUT
412s, Delimiter listings, truncated pages) and the PosixStorage /
ConditionalPutStorage claim contract."""

import datetime
import io

import pytest

from debezium_server_batch_spark.plans.storage import (
    ConditionalPutStorage,
    PosixStorage,
    S3Storage,
)


class FakeS3Client:
    """Minimal S3 double with the behaviors S3Storage depends on:
    IfNoneMatch='*' conditional PUT (412 on existing key), HeadObject
    404s, ListObjectsV2 with Delimiter/CommonPrefixes and 2-key pages
    (forces the continuation-token path)."""

    PAGE = 2

    class _Exceptions:
        class ClientError(Exception):
            def __init__(self, code):
                super().__init__(f"http {code}")
                self.response = {"ResponseMetadata": {"HTTPStatusCode": code}}

    def __init__(self):
        self.objects: dict[str, bytes] = {}
        self.exceptions = self._Exceptions()

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
        if IfNoneMatch == "*" and Key in self.objects:
            raise self.exceptions.ClientError(412)
        self.objects[Key] = Body

    def get_object(self, Bucket, Key):
        if Key not in self.objects:
            raise self.exceptions.ClientError(404)
        return {"Body": io.BytesIO(self.objects[Key])}

    def head_object(self, Bucket, Key):
        if Key not in self.objects:
            raise self.exceptions.ClientError(404)
        return {"LastModified": datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)}

    def delete_object(self, Bucket, Key):
        self.objects.pop(Key, None)

    def list_objects_v2(self, Bucket, Prefix="", Delimiter=None, MaxKeys=None, ContinuationToken=None):
        keys = sorted(k for k in self.objects if k.startswith(Prefix))
        start = int(ContinuationToken) if ContinuationToken else 0
        page_size = min(MaxKeys or self.PAGE, self.PAGE)
        contents, prefixes, consumed = [], set(), 0
        i = start
        while i < len(keys) and consumed < page_size:
            k = keys[i]
            i += 1
            consumed += 1
            if Delimiter:
                rest = k[len(Prefix):]
                if Delimiter in rest:
                    prefixes.add(Prefix + rest.split(Delimiter, 1)[0] + Delimiter)
                    continue
            contents.append({"Key": k})
        resp = {
            "Contents": contents,
            "CommonPrefixes": [{"Prefix": p} for p in sorted(prefixes)],
            "KeyCount": len(contents) + len(prefixes),
        }
        if i < len(keys):
            resp["IsTruncated"] = True
            resp["NextContinuationToken"] = str(i)
        return resp


@pytest.fixture()
def s3():
    client = FakeS3Client()
    return S3Storage("bkt", prefix="lake", client=client), client


def test_s3_claim_is_conditional_put(s3):
    st, _ = s3
    assert st.claim("t/_meta/v00000001.json", "A")
    assert not st.claim("t/_meta/v00000001.json", "B")  # 412 → race lost
    assert st.read_text("t/_meta/v00000001.json") == "A"  # winner intact


def test_s3_read_write_exists_delete_mtime(s3):
    st, _ = s3
    assert not st.exists("t/x.json")
    st.write_text("t/x.json", "hello")
    assert st.exists("t/x.json")
    assert st.read_text("t/x.json") == "hello"
    assert isinstance(st.mtime("t/x.json"), float)
    st.delete("t/x.json")
    assert not st.exists("t/x.json")


def test_s3_listdir_prefixes_and_pagination(s3):
    st, _ = s3
    # 5 objects → 3 pages at PAGE=2: exercises the continuation token
    for k in ("t/a.json", "t/b.json", "t/sub/x.json", "t/sub/y.json", "t/zub/z.json"):
        st.write_text(k, "v")
    assert st.listdir("t") == ["a.json", "b.json", "sub", "zub"]
    assert st.listdir("t/sub") == ["x.json", "y.json"]
    assert st.isdir("t/sub") and not st.isdir("t/nope")


def test_s3_walk_files_and_uri_keys(s3):
    st, client = s3
    st.write_text("t/data/c1/f1.parquet", "p")
    st.write_text("t/data/c2/f2.parquet", "p")
    walked = sorted(st.walk_files("t/data"))
    assert walked == [
        "s3://bkt/lake/t/data/c1/f1.parquet",
        "s3://bkt/lake/t/data/c2/f2.parquet",
    ]
    # s3:// URIs round-trip back to the same key space (vacuum feeds
    # walk_files output into delete/mtime)
    assert st.exists(walked[0])
    st.delete(walked[0])
    assert "lake/t/data/c1/f1.parquet" not in client.objects
    # makedirs/cleanup are no-ops on a keyspace
    st.makedirs("t/whatever")
    st.cleanup_empty_dirs("t")


def test_posix_and_condput_claim_contract(tmp_path):
    for st in (PosixStorage(), ConditionalPutStorage()):
        d = tmp_path / type(st).__name__
        st.makedirs(str(d))
        p = str(d / "v1.json")
        assert st.claim(p, "first")
        assert not st.claim(p, "second")
        assert st.read_text(p) == "first"


def test_s3_exists_propagates_non_404(s3):
    st, client = s3

    class Throttled(FakeS3Client):
        def head_object(self, Bucket, Key):
            raise self.exceptions.ClientError(503)

    st2 = S3Storage("bkt", client=Throttled())
    with pytest.raises(Throttled._Exceptions.ClientError):
        st2.exists("t/x.json")  # throttling must NOT read as "absent"


def test_s3_rejects_foreign_bucket_uri(s3):
    st, _ = s3
    with pytest.raises(ValueError, match="bound to"):
        st.delete("s3://other-bucket/t/x.json")


def test_s3_claim_resolves_own_retried_put(s3):
    """boto3's automatic retries can 412 a conditional PUT whose first
    attempt actually landed our payload (response lost in transit).
    claim() must GET-and-compare instead of concluding the race was
    lost — the CommitStateUnknown resolution."""
    st, client = s3

    class RetriedPut(FakeS3Client):
        def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
            if IfNoneMatch == "*" and Key not in self.objects:
                # first attempt lands, response is "lost", auto-retry
                # sees the key exist → the SDK surfaces one 412
                self.objects[Key] = Body
                raise self.exceptions.ClientError(412)
            super().put_object(Bucket, Key, Body, IfNoneMatch=IfNoneMatch)

    st2 = S3Storage("bkt", client=RetriedPut())
    assert st2.claim("t/_meta/v1.json", "mine-uuid-abc")  # own payload → won
    assert not st2.claim("t/_meta/v1.json", "other-uuid")  # genuine loss


def test_s3_claim_transport_error_resolution(s3):
    """A timeout/conn-reset after the PUT may or may not have landed:
    object present with our payload → True; present with another
    writer's → False; absent → state unknown, original error re-raised."""
    st, _ = s3

    class FlakyPut(FakeS3Client):
        land = True

        def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
            if IfNoneMatch == "*" and Key not in self.objects:
                if self.land:
                    self.objects[Key] = Body
                raise ConnectionResetError("wire dropped mid-response")
            super().put_object(Bucket, Key, Body, IfNoneMatch=IfNoneMatch)

    client = FlakyPut()
    st2 = S3Storage("bkt", client=client)
    assert st2.claim("t/_meta/v1.json", "mine")  # landed → resolved as won
    client.land = False
    with pytest.raises(ConnectionResetError):
        st2.claim("t/_meta/v2.json", "mine")  # never landed → unknown, raise


def test_condput_write_text_is_atomic_under_crash(tmp_path, monkeypatch):
    """write_text must never expose a truncated/partial object at the
    final key (a real store's PUT is all-or-nothing): the inherited
    tmp+replace path means a crash anywhere before the rename leaves
    the previous complete object in place."""
    import os as _os

    st = ConditionalPutStorage()
    p = str(tmp_path / "ckpt.json")
    st.write_text(p, "old-complete")

    class Boom(RuntimeError):
        pass

    def explode(fd):  # crash after the NEW bytes hit the tmp file,
        raise Boom()  # before the atomic replace

    monkeypatch.setattr(_os, "fsync", explode)
    with pytest.raises(Boom):
        st.write_text(p, "new-half-written")
    monkeypatch.undo()
    assert st.read_text(p) == "old-complete"  # final key: old object intact


def test_condput_claim_is_cross_process_atomic(tmp_path):
    """The double's claim must hold across PROCESSES (a real conditional
    PUT serializes server-side): N forked writers racing on one version
    key — exactly one wins, and the winner's content is intact."""
    import subprocess
    import sys

    d = tmp_path / "race"
    d.mkdir()
    code = f"""
import sys
sys.path.insert(0, {str(__import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))!r})
from debezium_server_batch_spark.plans.storage import ConditionalPutStorage
st = ConditionalPutStorage()
print(st.claim({str(d / 'v1.json')!r}, sys.argv[1]), end="")
"""
    script = tmp_path / "claimer.py"
    script.write_text(code)
    procs = [
        subprocess.Popen([sys.executable, str(script), f"writer-{i}"], stdout=subprocess.PIPE)
        for i in range(6)
    ]
    outs = [p.communicate()[0].decode() for p in procs]
    assert sorted(outs).count("True") == 1  # exactly one winner
    content = (d / "v1.json").read_text()
    assert content.startswith("writer-")  # intact, single writer's payload
