package graft.ops

import java.nio.file.{Files, Path => JPath, Paths}
import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, Executors, TimeUnit}

import graft.TestSpark
import org.apache.hadoop.fs.{FileSystem, Path}
import org.scalatest.funsuite.AnyFunSuite

/** The ClaimStore seam (VERDICT r11 #2): epoch claims must stay safe when
  * the storage's "create iff absent" primitive is swapped — the S3-class
  * deployment story. The fake here models exactly what a conditional put
  * gives you (one atomic compare-and-create over an object key, nothing
  * else: no O_EXCL, no visible claim files on the filesystem), and the
  * race tests prove that primitive ALONE is sufficient for distinct-epoch
  * claims — so plugging a real S3 `If-None-Match` / GCS
  * `if-generation-match: 0` store in needs no other changes.
  */
class ClaimStoreSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  /** An object store reduced to its conditional-put: claims live in a
    * shared key set, putIfAbsent-atomic, invisible to the filesystem.
    */
  final class FakeConditionalPutStore extends ClaimStore {
    val objects: java.util.Set[String] = ConcurrentHashMap.newKeySet[String]()
    var creates = new java.util.concurrent.atomic.AtomicInteger(0)
    override def createIfAbsent(fs: FileSystem, path: Path): Boolean = {
      creates.incrementAndGet()
      objects.add(path.toString) // ConcurrentHashMap-backed: atomic iff-absent
    }
    override def exists(fs: FileSystem, path: Path): Boolean =
      objects.contains(path.toString)
  }

  private def freshDir(name: String): String = {
    val p = Paths.get(s"target/claim_store_spec/$name")
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[JPath]())
        .forEach(f => Files.deleteIfExists(f))
    Files.createDirectories(p)
    p.toString
  }

  test("16 threads racing through a conditional-put-only store claim 16 " +
    "DISTINCT epochs") {
    val dir = freshDir("race")
    val store = new FakeConditionalPutStore
    val n = 16
    val ready = new CountDownLatch(n)
    val go = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(n)
    val claims =
      try {
        val futures = (1 to n).map { _ =>
          pool.submit(new java.util.concurrent.Callable[Int] {
            def call(): Int = {
              ready.countDown(); go.await()
              IncrementalDedup.Manifest.claimEpoch(spark, dir, 1, store)
            }
          })
        }
        ready.await(); go.countDown()
        futures.map(_.get(30, TimeUnit.SECONDS))
      } finally pool.shutdown()
    assert(claims.toSet.size == n,
      s"every racer must win a distinct epoch, got $claims")
    assert(claims.sorted == (1 to n),
      "claims must be the dense next-available range")
    // the filesystem never saw a claim object — they live in the store
    assert(!Files.list(Paths.get(dir)).iterator().hasNext,
      "conditional-put claims must not leak onto the filesystem")
  }

  test("claims through the store still skip COMMITTED epochs (manifest " +
    "rows stay filesystem-side)") {
    val dir = freshDir("skip_committed")
    val store = new FakeConditionalPutStore
    IncrementalDedup.Manifest.write(spark, dir, 1, Seq("k" -> "v"))
    IncrementalDedup.Manifest.write(spark, dir, 2, Seq("k" -> "v"))
    assert(IncrementalDedup.Manifest.claimEpoch(spark, dir, 1, store) == 3)
    // and a claimed-but-uncommitted epoch is skipped by the NEXT claimer
    assert(IncrementalDedup.Manifest.claimEpoch(spark, dir, 1, store) == 4)
  }

  test("writeIfAbsent: N threads racing to publish the SAME epoch — " +
    "exactly one wins, and the surviving row is the winner's (the " +
    "conditional commit the snapshot lake's OCC loop rides)") {
    val dir = freshDir("write_if_absent")
    val n = 12
    val ready = new CountDownLatch(n)
    val go = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(n)
    val wins =
      try {
        val futures = (0 until n).map { i =>
          pool.submit(new java.util.concurrent.Callable[Boolean] {
            def call(): Boolean = {
              ready.countDown(); go.await()
              IncrementalDedup.Manifest.writeIfAbsent(
                spark, dir, 7, Seq("writer" -> i.toString))
            }
          })
        }
        ready.await(); go.countDown()
        futures.map(_.get(30, TimeUnit.SECONDS))
      } finally pool.shutdown()
    assert(wins.count(identity) == 1,
      s"exactly one publisher must win epoch 7, got ${wins.count(identity)}")
    val rows = IncrementalDedup.Manifest.read(spark, dir)
    assert(rows.map(_._1) == Seq(7))
    val winner = wins.indexOf(true)
    assert(rows.head._2("writer") == winner.toString,
      "the committed row must be the winning thread's content, untorn")
    // no temp litter
    assert(!Files.list(Paths.get(dir)).iterator().asScalaNames
      .exists(_.startsWith(".tmp")), "losers must clean up their temp files")
  }

  private implicit class It(it: java.util.Iterator[JPath]) {
    def asScalaNames: Iterator[String] = {
      import scala.jdk.CollectionConverters._
      it.asScala.map(_.getFileName.toString)
    }
  }

  test("FsClaimStore (the default): racing file:// threads claim distinct " +
    "epochs via O_CREAT|O_EXCL") {
    val dir = freshDir("fs_race")
    val n = 8
    val ready = new CountDownLatch(n)
    val go = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(n)
    val claims =
      try {
        val futures = (1 to n).map { _ =>
          pool.submit(new java.util.concurrent.Callable[Int] {
            def call(): Int = {
              ready.countDown(); go.await()
              IncrementalDedup.Manifest.claimEpoch(spark, dir, 5)
            }
          })
        }
        ready.await(); go.countDown()
        futures.map(_.get(30, TimeUnit.SECONDS))
      } finally pool.shutdown()
    assert(claims.toSet.size == n,
      s"every racer must win a distinct epoch, got $claims")
    (5 until 5 + n).foreach { e =>
      assert(Files.exists(Paths.get(s"$dir/epoch-$e.claim")))
    }
  }
}
