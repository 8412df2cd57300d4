"""Minimal in-process S3 REST endpoint for object-store tests.

Implements just enough of the S3 HTTP API for pyarrow's S3FileSystem
(and any SigV4 client — auth headers are ignored) to list, read, and
write objects against an in-memory bucket map: ListObjectsV2 with
prefix/delimiter, GET (with Range), HEAD, PUT, DELETE, and the
multipart-upload trio pyarrow uses for output streams. Test-only —
the engine itself speaks pyarrow/Hadoop filesystem APIs and never
imports this."""

from __future__ import annotations

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse
from xml.sax.saxutils import escape


class S3Store:
    def __init__(self) -> None:
        self.objects: dict[tuple[str, str], bytes] = {}  # (bucket, key)
        self.uploads: dict[str, dict[int, bytes]] = {}
        self.buckets: set[str] = set()
        self._next_upload = 0
        self.lock = threading.Lock()


def _handler(store: S3Store):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # silence
            pass

        def _split(self):
            u = urlparse(self.path)
            parts = unquote(u.path).lstrip("/").split("/", 1)
            bucket = parts[0]
            key = parts[1] if len(parts) > 1 else ""
            return bucket, key, parse_qs(u.query, keep_blank_values=True)

        def _send(self, code: int, body: bytes = b"",
                  ctype: str = "application/xml", extra=()):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            for k, v in extra:
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def _not_found(self, what="NoSuchKey"):
            body = (
                f"<?xml version='1.0'?><Error><Code>{what}</Code>"
                "<Message>missing</Message></Error>"
            ).encode()
            self._send(404, body)

        def do_HEAD(self):
            bucket, key, _ = self._split()
            with store.lock:
                if not key:
                    if bucket in store.buckets:
                        self._send(200)
                    else:
                        self._not_found("NoSuchBucket")
                    return
                obj = store.objects.get((bucket, key))
            if obj is None:
                self._not_found()
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(obj)))
            self.send_header("Content-Type", "binary/octet-stream")
            self.send_header("ETag", '"x"')
            self.send_header(
                "Last-Modified", "Thu, 01 Jan 2026 00:00:00 GMT"
            )
            self.end_headers()

        def do_GET(self):
            bucket, key, q = self._split()
            with store.lock:
                if not key:  # ListObjectsV2
                    if bucket not in store.buckets:
                        self._not_found("NoSuchBucket")
                        return
                    prefix = q.get("prefix", [""])[0]
                    delim = q.get("delimiter", [""])[0]
                    keys = sorted(
                        k for (b, k) in store.objects if b == bucket
                        and k.startswith(prefix)
                    )
                    contents = []
                    commons = []
                    seen = set()
                    for k in keys:
                        if delim:
                            rest = k[len(prefix):]
                            if delim in rest:
                                c = prefix + rest.split(delim, 1)[0] + delim
                                if c not in seen:
                                    seen.add(c)
                                    commons.append(c)
                                continue
                        contents.append(k)
                    items = "".join(
                        f"<Contents><Key>{escape(k)}</Key>"
                        f"<Size>{len(store.objects[(bucket, k)])}</Size>"
                        "<LastModified>2026-01-01T00:00:00.000Z"
                        "</LastModified><ETag>&quot;x&quot;</ETag>"
                        "<StorageClass>STANDARD</StorageClass></Contents>"
                        for k in contents
                    ) + "".join(
                        f"<CommonPrefixes><Prefix>{escape(c)}</Prefix>"
                        "</CommonPrefixes>"
                        for c in commons
                    )
                    body = (
                        "<?xml version='1.0' encoding='UTF-8'?>"
                        "<ListBucketResult><IsTruncated>false"
                        f"</IsTruncated><Name>{bucket}</Name>"
                        f"<Prefix>{escape(prefix)}</Prefix>"
                        f"<KeyCount>{len(contents) + len(commons)}"
                        f"</KeyCount>{items}</ListBucketResult>"
                    ).encode()
                    self._send(200, body)
                    return
                obj = store.objects.get((bucket, key))
            if obj is None:
                self._not_found()
                return
            rng = self.headers.get("Range")
            if rng and rng.startswith("bytes="):
                lo_s, _, hi_s = rng[6:].partition("-")
                lo = int(lo_s) if lo_s else 0
                hi = int(hi_s) if hi_s else len(obj) - 1
                hi = min(hi, len(obj) - 1)
                part = obj[lo : hi + 1]
                self._send(
                    206, part, "binary/octet-stream",
                    [("Content-Range",
                      f"bytes {lo}-{hi}/{len(obj)}"),
                     ("ETag", '"x"'),
                     ("Last-Modified",
                      "Thu, 01 Jan 2026 00:00:00 GMT")],
                )
            else:
                self._send(
                    200, obj, "binary/octet-stream",
                    [("ETag", '"x"'),
                     ("Last-Modified",
                      "Thu, 01 Jan 2026 00:00:00 GMT")],
                )

        def _body(self) -> bytes:
            n = int(self.headers.get("Content-Length", "0"))
            return self.rfile.read(n) if n else b""

        def do_PUT(self):
            bucket, key, q = self._split()
            data = self._body()
            with store.lock:
                if not key:  # CreateBucket
                    store.buckets.add(bucket)
                    self._send(200)
                    return
                if "partNumber" in q and "uploadId" in q:
                    uid = q["uploadId"][0]
                    store.uploads.setdefault(uid, {})[
                        int(q["partNumber"][0])
                    ] = data
                    self._send(200, b"", extra=[("ETag", '"p"')])
                    return
                store.buckets.add(bucket)
                store.objects[(bucket, key)] = data
            self._send(200, b"", extra=[("ETag", '"x"')])

        def do_POST(self):
            bucket, key, q = self._split()
            with store.lock:
                if "uploads" in q:  # CreateMultipartUpload
                    store._next_upload += 1
                    uid = f"up{store._next_upload}"
                    store.uploads[uid] = {}
                    body = (
                        "<?xml version='1.0'?><InitiateMultipartUpload"
                        f"Result><Bucket>{bucket}</Bucket>"
                        f"<Key>{escape(key)}</Key>"
                        f"<UploadId>{uid}</UploadId>"
                        "</InitiateMultipartUploadResult>"
                    ).encode()
                    self._body()
                    self._send(200, body)
                    return
                if "uploadId" in q:  # CompleteMultipartUpload
                    uid = q["uploadId"][0]
                    parts = store.uploads.pop(uid, {})
                    store.buckets.add(bucket)
                    store.objects[(bucket, key)] = b"".join(
                        parts[i] for i in sorted(parts)
                    )
                    self._body()
                    body = (
                        "<?xml version='1.0'?>"
                        "<CompleteMultipartUploadResult>"
                        f"<Bucket>{bucket}</Bucket>"
                        f"<Key>{escape(key)}</Key>"
                        "<ETag>\"x\"</ETag>"
                        "</CompleteMultipartUploadResult>"
                    ).encode()
                    self._send(200, body)
                    return
            self._body()
            self._send(400)

        def do_DELETE(self):
            bucket, key, q = self._split()
            with store.lock:
                if "uploadId" in q:
                    store.uploads.pop(q["uploadId"][0], None)
                else:
                    store.objects.pop((bucket, key), None)
            self._send(204)

    return Handler


class S3Stub:
    """Context manager: an S3 endpoint on 127.0.0.1:<port>."""

    def __init__(self) -> None:
        self.store = S3Store()
        self.server = ThreadingHTTPServer(
            ("127.0.0.1", 0), _handler(self.store)
        )
        self.port = self.server.server_address[1]
        self.thread = threading.Thread(
            target=self.server.serve_forever, daemon=True
        )

    def __enter__(self):
        self.thread.start()
        time.sleep(0.05)
        return self

    def __exit__(self, *exc):
        self.server.shutdown()
        self.server.server_close()

    def uri(self, bucket: str, key: str = "") -> str:
        """s3:// URI carrying the endpoint/credential options pyarrow
        reads from the query string."""
        opts = (
            f"endpoint_override=http://127.0.0.1:{self.port}"
            "&region=us-east-1&allow_bucket_creation=true"
            "&allow_bucket_deletion=true"
        )
        path = f"{bucket}/{key}".rstrip("/")
        return f"s3://test:test@{path}?{opts}"
