package graft

/** A RawLocalFileSystem registered under a NON-file scheme — lets the
  * suite execute the commit lock's remote branch
  * (`FileSystem.create(path, overwrite = false)` + heartbeat
  * `setTimes` + `delete`) and full parquet publishes against a
  * scheme-qualified root, the wire the hdfs:// deployment uses,
  * without an HDFS cluster. Backed by the local disk; the point is
  * the scheme dispatch, not the storage.
  */
class MockSchemeFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mockfs"
  override def getUri: java.net.URI = java.net.URI.create("mockfs:///")
}
