package graft.config

import java.nio.charset.StandardCharsets.UTF_8
import java.security.SecureRandom
import java.util.Base64

import javax.crypto.{Cipher, SecretKeyFactory}
import javax.crypto.spec.{GCMParameterSpec, PBEKeySpec, SecretKeySpec}

/** Encrypted secrets file — the reference's `teleport secrets` subsystem
  * (/root/reference/secrets/secrets.go, cli.go:114-180) with the same
  * semantics over JDK crypto: AES-256-GCM per-variable encryption, a random
  * per-file salt in a plaintext header, key derived with PBKDF2-SHA512 from
  * the `GRAFT_SECRET_KEY` env value (≙ TELEPORT_SECRET_KEY), every
  * ciphertext under a fresh random nonce (secrets.go nonce-reuse test).
  * Decrypted variables feed [[JobSpec]]'s `$VAR` interpolation, the way the
  * reference exposes secrets to its config scripts.
  *
  * File layout (version 2 analogue):
  * {{{
  *   {"version":2,"salt":"<base64>"}        — header line, plaintext
  *   <base64(nonce || gcm(key || "=" || value))>   — one line per variable
  * }}}
  */
object Secrets {
  val KeyEnvVariable = "GRAFT_SECRET_KEY"
  private val Iterations = 100000
  private val rnd = new SecureRandom()

  case class Header(version: Int, salt: String)

  private def deriveKey(secret: String, saltB64: String): SecretKeySpec = {
    val spec = new PBEKeySpec(secret.toCharArray,
      Base64.getDecoder.decode(saltB64), Iterations, 256)
    val f = SecretKeyFactory.getInstance("PBKDF2WithHmacSHA512")
    new SecretKeySpec(f.generateSecret(spec).getEncoded, "AES")
  }

  private def encrypt(key: SecretKeySpec, plaintext: String): String = {
    val nonce = new Array[Byte](12)
    rnd.nextBytes(nonce)
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, key, new GCMParameterSpec(128, nonce))
    Base64.getEncoder.encodeToString(nonce ++ c.doFinal(plaintext.getBytes(UTF_8)))
  }

  private def decrypt(key: SecretKeySpec, encoded: String): String = {
    val raw = Base64.getDecoder.decode(encoded)
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(Cipher.DECRYPT_MODE, key, new GCMParameterSpec(128, raw.take(12)))
    new String(c.doFinal(raw.drop(12)), UTF_8)
  }

  /** ≙ `teleport secrets generate_secret_key` (cli.go:121-129). */
  def generateSecretKey(): String = {
    val charset = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    Iterator.continually(charset(rnd.nextInt(charset.length))).take(64).mkString
  }

  private def readLines(file: java.nio.file.Path): (Header, List[String]) = {
    val lines = java.nio.file.Files.readAllLines(file).toArray(Array.empty[String]).toList
    if (lines.isEmpty || lines.head.trim.isEmpty)
      throw new IllegalArgumentException(
        s"secrets file $file is empty or missing its header line — " +
        "initialize it with `secrets init` first")
    val h = org.json4s.jackson.JsonMethods.parse(lines.head)
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    (h.extract[Header], lines.tail.filter(_.nonEmpty))
  }

  private def write(file: java.nio.file.Path, h: Header, lines: List[String]): Unit = {
    val head = s"""{"version":${h.version},"salt":"${h.salt}"}"""
    // a bare filename ("secrets.enc") has a null parent — cwd needs no mkdir
    Option(file.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(file, (head :: lines).mkString("", "\n", "\n"))
  }

  /** The secret key, from env by default; explicit in tests (≙ the
    * reference reads TELEPORT_SECRET_KEY, secrets.go deriveKey). */
  def envSecret(): String = sys.env.getOrElse(KeyEnvVariable,
    throw new IllegalStateException(s"$KeyEnvVariable not set"))

  /** ≙ InitializeSecretsFile: fresh salt, empty body. */
  def init(file: java.nio.file.Path, secretKey: => String = envSecret()): Unit = {
    secretKey // fail fast like the reference when the key is unset
    val salt = new Array[Byte](32); rnd.nextBytes(salt)
    write(file, Header(2, Base64.getEncoder.encodeToString(salt)), Nil)
  }

  /** ≙ UpdateSecret (last write wins on read). */
  def set(file: java.nio.file.Path, key: String, value: String,
      secretKey: => String = envSecret()): Unit = {
    val (h, lines) = readLines(file)
    val k = deriveKey(secretKey, h.salt)
    write(file, h, lines :+ encrypt(k, s"$key=$value"))
  }

  /** ≙ ReadSecretsFile: decrypted variables, later entries override. */
  def read(file: java.nio.file.Path, secretKey: => String = envSecret()): Map[String, String] = {
    if (!java.nio.file.Files.exists(file)) return Map.empty
    val (h, lines) = readLines(file)
    val k = deriveKey(secretKey, h.salt)
    lines.map(decrypt(k, _)).map { s =>
      val Array(key, v) = s.split("=", 2); key -> v
    }.toMap
  }

  /** ≙ DeleteSecret. */
  def delete(file: java.nio.file.Path, key: String,
      secretKey: => String = envSecret()): Unit = {
    val (h, lines) = readLines(file)
    val k = deriveKey(secretKey, h.salt)
    val kept = lines.filterNot(l => decrypt(k, l).split("=", 2)(0) == key)
    write(file, h, kept)
  }

  /** Environment for [[JobSpec]] interpolation: process env overlaid with
    * decrypted secrets (secrets win — they are the more specific source).
    * A supplied secrets file with no `GRAFT_SECRET_KEY` in the environment
    * FAILS FAST (via [[envSecret]] inside [[read]]) — silently interpolating
    * `$SECRET` placeholders to empty strings would run misconfigured jobs
    * against blank credentials, where the reference errors on a missing key. */
  def envWith(file: Option[java.nio.file.Path]): String => Option[String] = {
    val s = file.map { f =>
      // a supplied-but-missing file is a misconfiguration, not "no secrets":
      // read()'s missing-file → empty behavior is for optional callers only
      if (!java.nio.file.Files.exists(f))
        throw new IllegalStateException(s"secrets file not found: $f")
      read(f)
    }.getOrElse(Map.empty)
    name => s.get(name).orElse(sys.env.get(name))
  }
}
