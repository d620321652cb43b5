package graft

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, RawLocalFileSystem}

/** A local-disk-backed `FileSystem` that answers to the `mockobj://`
  * scheme — the stand-in for an object-store connector in the
  * dir-rename-gate spec. Overriding `getUri` is the whole trick:
  * `checkPath`/`makeQualified` then accept mockobj paths while every
  * data operation still resolves through the path component to local
  * disk.
  */
class MockObjectStoreFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("mockobj:///")
}

/** The `AbstractFileSystem` binding for `mockobj://`, registered in the
  * gate spec via `fs.AbstractFileSystem.mockobj.impl`. Being a REAL,
  * working scheme through the Fs seam is the point: it proves the
  * refusal the spec asserts comes from the gate, not from an
  * unknown-scheme resolution error.
  */
class MockObjectStoreFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new MockObjectStoreFileSystem(), conf, "mockobj", false)
