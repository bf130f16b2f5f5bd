package graft.sinks

import java.nio.file.Files

import graft.SparkSuiteBase
import graft.model.{Element, ElementMetadata, ElementType}

/** A stand-in for an object store: local semantics, foreign scheme. Only the
  * scheme matters — [[RenameContract]] judges by it, and the contract check
  * must fire BEFORE any data operation. */
class FakeObjectStoreFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "fakeobj"
  override def getUri: java.net.URI = java.net.URI.create("fakeobj:///")
}

/** The durable sinks' atomic-rename contract: object-store-like schemes are
  * rejected loudly at entry (not discovered as silent corruption under a
  * crash), HDFS-like ones pass, and the unsafe override is honored. */
class RenameContractSpec extends SparkSuiteBase {

  private def conf = new org.apache.hadoop.conf.Configuration(false)

  test("a scheme without atomic rename is rejected with an error naming the contract") {
    val ex = intercept[IllegalStateException] {
      RenameContract.requireAtomicRename(new FakeObjectStoreFs, conf, "ElementLake")
    }
    assert(ex.getMessage.contains("ATOMIC rename"), ex.getMessage)
    assert(ex.getMessage.contains("fakeobj"), ex.getMessage)
    assert(ex.getMessage.contains(RenameContract.OverrideKey), ex.getMessage)
  }

  test("the unsafe override waives the check") {
    val c = conf
    c.setBoolean(RenameContract.OverrideKey, true)
    RenameContract.requireAtomicRename(new FakeObjectStoreFs, c, "ElementLake")
  }

  test("local and HDFS-like schemes pass") {
    val local = org.apache.hadoop.fs.FileSystem.getLocal(
      new org.apache.hadoop.conf.Configuration())
    RenameContract.requireAtomicRename(local, conf, "ElementLake")
  }

  test("every scheme in the atomic-rename allowlist passes; object-store " +
      "schemes are rejected") {
    class SchemeFs(scheme: String) extends org.apache.hadoop.fs.RawLocalFileSystem {
      override def getScheme: String = scheme
      override def getUri: java.net.URI = java.net.URI.create(s"$scheme:///")
    }
    Seq("hdfs", "viewfs", "webhdfs", "swebhdfs", "ofs", "o3fs", "alluxio", "file")
      .foreach(s =>
        RenameContract.requireAtomicRename(new SchemeFs(s), conf, "ElementLake"))
    Seq("s3a", "s3", "gs", "abfs", "abfss", "wasb", "oss", "cos", "swift")
      .foreach(s => intercept[IllegalStateException](
        RenameContract.requireAtomicRename(new SchemeFs(s), conf, "ElementLake")))
  }

  test("ElementLake refuses an object-store path end-to-end (append and compact)") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.fakeobj.impl", classOf[FakeObjectStoreFs].getName)
    val dir = Files.createTempDirectory("fakeobj-lake")
    try {
      val sp = spark
      import sp.implicits._
      val ds = Seq(Element("", ElementType.Title, "t", "d1", 1L,
        ElementMetadata.empty)).toDS()
      val path = s"fakeobj:$dir"
      val exA = intercept[IllegalStateException] {
        ElementLake.append(ds, path)
      }
      assert(exA.getMessage.contains("ElementLake requires"), exA.getMessage)
      val exC = intercept[IllegalStateException] {
        ElementLake.compact(spark, path)
      }
      assert(exC.getMessage.contains("ATOMIC rename"), exC.getMessage)
      // nothing was written before the check fired
      assert(!Files.list(dir).iterator().hasNext, "guard fired after a write")
    } finally graft.FsUtil.deleteRecursively(dir)
  }

  test("StageStore refuses an object-store root at construction") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.fakeobj.impl", classOf[FakeObjectStoreFs].getName)
    val dir = Files.createTempDirectory("fakeobj-stages")
    try {
      val ex = intercept[IllegalStateException] {
        new StageStore(spark, s"fakeobj:$dir")
      }
      assert(ex.getMessage.contains("StageStore requires"), ex.getMessage)
    } finally graft.FsUtil.deleteRecursively(dir)
  }

  test("the unsafe override opens the escape hatch end-to-end") {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.fakeobj.impl", classOf[FakeObjectStoreFs].getName)
    hc.setBoolean(RenameContract.OverrideKey, true)
    val dir = Files.createTempDirectory("fakeobj-override")
    try {
      val sp = spark
      import sp.implicits._
      val ds = Seq(Element("", ElementType.Title, "t", "d1", 1L,
        ElementMetadata.empty.copy(filetype = Some("text/plain")))).toDS()
      // the guard stands down; the write lands through the foreign scheme
      ElementLake.append(ds, s"fakeobj:$dir/lake")
      assert(ElementLake.read(spark, s"fakeobj:$dir/lake").count() == 1)
      val store = new StageStore(spark, s"fakeobj:$dir/stages")
      assert(store.apply("s1", ds.toDF().select("doc_id")).count() == 1)
    } finally {
      hc.unset(RenameContract.OverrideKey)
      graft.FsUtil.deleteRecursively(dir)
    }
  }
}
