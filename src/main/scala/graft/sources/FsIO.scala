package graft.sources

import java.io.{InputStream, OutputStream}
import java.nio.ByteBuffer
import java.nio.channels.SeekableByteChannel
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FileSystem, LocalFileSystem, Path}

/** Hadoop-FileSystem I/O for the interchange layer (HDF5 / FITS /
  * Arrow IPC readers, writers and sharded exporters). Every positioned
  * read maps to `FSDataInputStream.readFully(pos, ...)` and every
  * write to `FileSystem.create`, so the same code paths run against
  * `file:`, `hdfs:`, `s3a:` or any other Hadoop scheme — the layer a
  * 100 TB corpus actually lives on. Plain local paths (no scheme)
  * resolve to the RAW local filesystem: bytes land exactly where the
  * path says, no `.crc` sidecar files (the formats carry their own
  * integrity structures), and local-mode performance matches direct
  * `RandomAccessFile` access.
  *
  * Configuration: the active SparkSession's `hadoopConfiguration`
  * when one exists (driver, or local-mode executor threads); on a
  * remote executor with no session, a fresh `Configuration` (which
  * loads the cluster's `core-site.xml`) plus any `spark.hadoop.*`
  * overrides from the executor's SparkConf — the same propagation
  * Spark applies to its own Hadoop I/O.
  */
private[graft] object FsIO {

  /** Built once per SparkEnv (≈ once per executor lifetime) when no
    * active session exists: Configuration construction parses the
    * classpath XML resources — tens of ms — and interchange scans open
    * a handle per (partition, backing file), so paying it per open
    * would tax every task. Keyed on the SparkEnv INSTANCE so a new
    * application in the same JVM (new spark.hadoop.* overrides)
    * rebuilds, and the env-null case (no overrides discoverable) is
    * never cached. FileSystem instances are cached by Hadoop itself. */
  @volatile private var executorConf
      : (java.lang.ref.WeakReference[AnyRef], Configuration) = _

  def conf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse {
        val env = org.apache.spark.SparkEnv.get
        if (env == null) new Configuration()
        else {
          val cached = executorConf
          // weak key: the cache must not keep a STOPPED SparkEnv (and
          // its block/memory managers) reachable for the JVM lifetime
          if (cached != null && (cached._1.get() eq env)) cached._2
          else {
            val c = new Configuration()
            env.conf.getAll.foreach { case (k, v) =>
              if (k.startsWith("spark.hadoop."))
                c.set(k.substring("spark.hadoop.".length), v)
            }
            // benign race: same value per env
            executorConf = (new java.lang.ref.WeakReference[AnyRef](env), c)
            c
          }
        }
      }

  /** FileSystem for a path, unwrapping the checksummed local FS to
    * its raw form (see class doc). */
  def fileSystem(p: Path): FileSystem = p.getFileSystem(conf()) match {
    case l: LocalFileSystem => l.getRawFileSystem
    case other => other
  }

  def resolve(path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (fileSystem(p), p)
  }

  def exists(path: String): Boolean = {
    val (fs, p) = resolve(path); fs.exists(p)
  }

  /** Immediate child DIRECTORY names of `dir` (sorted) — the zarr
    * group listing. */
  def listDirs(dir: String): Seq[String] = {
    val (fs, p) = resolve(dir)
    Option(fs.listStatus(p)).map(_.toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).sorted).getOrElse(Nil)
  }

  /** Glob-expand (sorted, deterministic), scheme-preserving for
    * remote filesystems like Readers.expandGlob. */
  def glob(pattern: String): Seq[String] = {
    val (fs, p) = resolve(pattern)
    Option(fs.globStatus(p)).map(_.toSeq.map { st =>
      val u = st.getPath.toUri
      if (u.getScheme == null || u.getScheme == "file") u.getPath
      else st.getPath.toString
    }.sorted).getOrElse(Nil)
  }

  /** Positioned-read handle — drop-in for `RandomAccessFile(path, "r")`
    * with the seek/readFully usage pattern. Each readFully issues ONE
    * positioned read (pread), so a handle is also safe to share across
    * interleaved range reads. */
  final class In(val path: String) extends AutoCloseable {
    private val (fs, p) = resolve(path)
    val length: Long = fs.getFileStatus(p).getLen
    private val in: FSDataInputStream = fs.open(p)
    private var pos = 0L
    def seek(addr: Long): Unit = pos = addr
    def getFilePointer: Long = pos
    def readFully(b: Array[Byte]): Unit = {
      in.readFully(pos, b, 0, b.length); pos += b.length
    }
    def readFully(b: Array[Byte], off: Int, len: Int): Unit = {
      in.readFully(pos, b, off, len); pos += len
    }
    override def close(): Unit = in.close()
  }

  /** Sequential create (overwrite), parent dirs made as needed. */
  def create(path: String): OutputStream = {
    val (fs, p) = resolve(path)
    fs.create(p, true)
  }

  /** Sequential open (plain InputStream consumers, e.g. the Arrow
    * STREAM-framing reader). */
  def open(path: String): InputStream = {
    val (fs, p) = resolve(path)
    fs.open(p)
  }

  def mkdirs(dir: String): Unit = {
    val (fs, p) = resolve(dir); fs.mkdirs(p)
  }

  /** Canonical string form of a path: qualified through its
    * FileSystem (relative paths absolutize, hdfs: gains its
    * authority), then rendered exactly as the listing helpers render
    * paths (file:/schemeless collapse to the bare local path). The
    * log-structured writers normalize their table roots through this
    * so string-prefix arithmetic against listFilesRecursive output is
    * sound for file:/, relative and remote-scheme inputs alike. */
  def normalize(path: String): String = {
    val (fs, p) = resolve(path)
    val q = fs.makeQualified(p)
    val u = q.toUri
    if (u.getScheme == null || u.getScheme == "file") u.getPath else q.toString
  }

  /** Recursive delete, no-op when absent (staging-dir hygiene for the
    * log-structured writers). */
  def deleteRecursive(path: String): Unit = {
    val (fs, p) = resolve(path)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Rename (same filesystem), loud on failure — the commit/promote
    * primitive of the log-structured writers. Parent dirs are made
    * first: HDFS rename (unlike local) requires the destination
    * directory to exist. */
  def rename(src: String, dst: String): Unit = {
    val (fs, p) = resolve(src)
    val d = new Path(dst)
    Option(d.getParent).foreach(fs.mkdirs(_))
    require(fs.rename(p, d), s"rename failed: $src -> $dst")
  }

  /** Plain child-file names of `dir` (sorted; directories excluded),
    * empty when absent — the transaction-log listing. */
  def listFileNames(dir: String): Seq[String] = {
    val (fs, p) = resolve(dir)
    if (!fs.exists(p)) Nil
    else Option(fs.listStatus(p)).map(_.toSeq.filter(_.isFile)
      .map(_.getPath.getName).sorted).getOrElse(Nil)
  }

  /** All files under `dir` recursively as (path, length, mtimeMs),
    * sorted by path — the staged-write enumeration. */
  def listFilesRecursive(dir: String): Seq[(String, Long, Long)] = {
    val (fs, p) = resolve(dir)
    if (!fs.exists(p)) return Nil
    val out = Seq.newBuilder[(String, Long, Long)]
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val st = it.next()
      val u = st.getPath.toUri
      val path = if (u.getScheme == null || u.getScheme == "file") u.getPath
                 else st.getPath.toString
      out += ((path, st.getLen, st.getModificationTime))
    }
    out.result().sortBy(_._1)
  }

  /** Delete `part-*<suffix>` shards under `dir` — the stale-shard
    * sweep every sharded exporter runs before writing (a re-export
    * with fewer partitions must not leave higher-numbered shards for
    * the glob read to pick up). */
  def deleteShards(dir: String, suffix: String): Unit = {
    val (fs, p) = resolve(dir)
    if (fs.exists(p))
      fs.listStatus(p).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("part-") && n.endsWith(suffix))
          fs.delete(st.getPath, false)
      }
  }

  /** Byte-counting OutputStream wrapper (sequential writers that need
    * their position for block padding, e.g. FITS 2880-byte blocks). */
  final class CountingOut(os: OutputStream) extends OutputStream {
    private var n = 0L
    def count: Long = n
    override def write(b: Int): Unit = { os.write(b); n += 1 }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      os.write(b, off, len); n += len
    }
    override def flush(): Unit = os.flush()
    override def close(): Unit = os.close()
  }

  /** SeekableByteChannel over a Hadoop input stream — what the Arrow
    * IPC file reader needs for footer-indexed batch access. */
  final class InChannel(path: String) extends SeekableByteChannel {
    private val (fs, p) = resolve(path)
    private val len = fs.getFileStatus(p).getLen
    private val in: FSDataInputStream = fs.open(p)
    private var open = true
    def read(dst: ByteBuffer): Int = {
      val pos = in.getPos
      if (pos >= len) return -1
      val want = math.min(dst.remaining().toLong, len - pos).toInt
      val buf = new Array[Byte](want)
      in.readFully(buf, 0, want)
      dst.put(buf, 0, want)
      want
    }
    def write(src: ByteBuffer): Int = throw new UnsupportedOperationException
    def position(): Long = in.getPos
    def position(newPosition: Long): SeekableByteChannel = {
      in.seek(newPosition); this
    }
    def size(): Long = len
    def truncate(size: Long): SeekableByteChannel =
      throw new UnsupportedOperationException
    def isOpen: Boolean = open
    def close(): Unit = { open = false; in.close() }
  }
}
